package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document ingest for a training-data pipeline — beyond
  * the reference (pure batch): a continuously-arriving corpus is
  * deduplicated online so downstream stages (tokenize, embed) never
  * see a repeat.
  *
  * Exact dedup key = md5(content), the same key as the batch operator
  * (`TextOps.exactDedupSummary`), so batch and stream agree on what a
  * duplicate is. State is bounded by the watermark:
  * `dropDuplicatesWithinWatermark` evicts a hash once the event-time
  * watermark passes it, which is the 100 TB-stream story — an
  * unbounded `dropDuplicates` would grow state with corpus size.
  */
object DocStream {

  /** First-seen documents of the stream; duplicates arriving within
    * the watermark horizon are dropped.
    *
    * @param docs streaming frame with (`idCol`, `textCol`,
    *             event_time: timestamp)
    * @param watermark eviction horizon, e.g. "10 minutes"
    */
  def dedupStream(docs: DataFrame, idCol: String, textCol: String,
      watermark: String): DataFrame = {
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col(idCol), col("content_hash"), col("event_time"))
  }

  /** foreachBatch sink that keeps a corpus CONTINUOUSLY near-deduped:
    * each micro-batch is deduplicated against the persisted
    * [[graft.operators.TextOps.MinhashIndex]] (all verified near-dup
    * pairs touching the batch append to `pairsDir`) and then folded
    * into the index ([[graft.operators.TextOps.minhashIndexAppend]]) so
    * the NEXT batch sees this one's documents. The full banded near-dup
    * semantics online — strictly more than [[signatureDedupStream]]'s
    * signature-equality prefilter, at foreachBatch (not per-row) cost.
    *
    * Index state is VERSIONED BY BATCH (`b<id>/` + a
    * `batch-<id>.done` marker as the LAST step): every write a batch
    * performs targets paths derived from its own id with overwrite
    * semantics (its pairs land in `pairsDir/batch-<id>`, its grown
    * index in `indexDir/b<id>`), and a replayed batch whose marker
    * exists is a pure no-op. A crash at ANY earlier point makes the
    * replay redo the batch deterministically against the latest
    * MARKED index version — partial pairs/index output from the
    * crashed attempt is overwritten, never appended to, so nothing
    * duplicates and nothing is lost. Marked `b<id>` dirs are
    * immutable; versions older than the latest marker can be deleted
    * once no reader holds them. Read the pair log with
    * `spark.read.parquet(s"$pairsDir/batch-*")`.
    *
    * Scale shape per batch: O(batch) banding + joins against the
    * saved index (see minhashDedupIncremental); the index read is
    * lazy, so only the joined partitions stream. */
  def incrementalDedupSink(indexDir: String, pairsDir: String,
      idCol: String, textCol: String, numHashes: Int, numBands: Int,
      minJaccard: Double): (DataFrame, Long) => Unit = {
    import graft.operators.TextOps
    import scala.jdk.CollectionConverters._
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val base = java.nio.file.Paths.get(indexDir)
      java.nio.file.Files.createDirectories(base)
      if (java.nio.file.Files.exists(base.resolve(s"batch-$batchId.done")))
        () // replayed batch: already applied, emit nothing
      else {
        val applied = {
          val s = java.nio.file.Files.list(base)
          try s.iterator().asScala.map(_.getFileName.toString)
            .flatMap {
              case m if m.startsWith("batch-") && m.endsWith(".done") =>
                m.stripPrefix("batch-").stripSuffix(".done").toLongOption
              case _ => None
            }.toSeq
          finally s.close()
        }
        val idx =
          if (applied.isEmpty) TextOps.minhashIndex(batch.limit(0),
            idCol, textCol, numHashes, numBands)
          else TextOps.loadMinhashIndex(spark,
            s"$indexDir/b${applied.max}")
        TextOps.minhashDedupIncremental(idx, batch, idCol, textCol,
          minJaccard)
          .write.mode("overwrite").parquet(s"$pairsDir/batch-$batchId")
        TextOps.minhashIndexAppend(idx, batch, idCol, textCol)
          .save(s"$indexDir/b$batchId")
        java.nio.file.Files.createFile(
          base.resolve(s"batch-$batchId.done"))
        graft.engine.Caches.drain(spark)
        ()
      }
    }
  }

  /** Streaming MinHash-SIGNATURE dedup — the streaming analogue of
    * the batch pipeline's exact-content COLLAPSE step (the hot-bucket
    * guard): documents whose full signature matches one seen within
    * the watermark horizon are dropped.
    *
    * Guaranteed semantics: equal TOKEN SETS imply equal signatures,
    * so every token-set-equal repeat (reordered/re-whitespaced
    * boilerplate — the dominant duplicate class) is dropped, strictly
    * more than [[dedupStream]]'s byte-exact key. Probabilistic bonus:
    * a true near-dup with token-set Jaccard j also collides with
    * probability j^numHashes (e.g. 0.9⁸ ≈ 0.43) — an honest RECALL
    * PREFILTER, not full near-dedup; banded OR-matching needs
    * cross-row state beyond a drop key and stays batch-side
    * (`TextOps.minhashDedupClusters`).
    *
    * The signature is computed per row ([[TextOps.withMinhashSignature]]
    * — no aggregation), which is what lets it precede the stateful
    * drop; state is one signature key per horizon like dedupStream. */
  def signatureDedupStream(docs: DataFrame, idCol: String,
      textCol: String, numHashes: Int, watermark: String): DataFrame = {
    // null-text rows have NULL signatures; concat_ws would collapse
    // them all onto "" and silently drop every one after the first.
    // Batch semantics (no signature row → never a duplicate) are
    // preserved by keying each null-text doc uniquely by its own id
    // (the \u0000 prefix cannot collide with a real numeric sig key).
    val sigKey = when(col(textCol).isNull,
      concat(lit("\u0000id:"), col(idCol).cast("string")))
      .otherwise(concat_ws("_",
        (0 until numHashes).map(k => col(s"sig$k")): _*))
    graft.operators.TextOps.withMinhashSignature(docs, textCol, numHashes)
      .withColumn("sig_key", sigKey)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("sig_key")
      .select(col(idCol), col("sig_key"), col("event_time"))
  }
}
