package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.DataFrame

import java.nio.file.{Files, Paths}

/** The continuously-deduped-corpus sink: batches folded through
  * [[DocStream.incrementalDedupSink]] must accumulate exactly the
  * full-corpus near-dup pairs, survive batch replays as no-ops, and
  * redo a crashed batch without duplicating or losing output. */
class IncrementalDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val NumHashes = 24
  private val NumBands = 12
  private val MinJ = 0.5

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"),
    (3L, "alpha beta gamma delta epsilon theta"),
    (4L, "one two three four five six"),
    (5L, "red orange yellow green blue violet"),
    (10L, "alpha beta gamma delta epsilon zeta"),
    (11L, "one two three four five seven"),
    (12L, "lorem ipsum dolor sit amet consectetur"),
    (13L, "lorem ipsum dolor sit amet elit"),
    (14L, "completely unrelated text entirely"))

  private def pairSet(df: DataFrame) =
    df.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6,
          BigDecimal.RoundingMode.HALF_EVEN))).toSet

  test("batches through the sink accumulate the full-corpus dedup; " +
      "replay is a no-op; a crashed batch redoes cleanly") {
    val work = Files.createTempDirectory("graft-incr-stream").toString
    val indexDir = s"$work/index"
    val pairsDir = s"$work/pairs"
    val sink = DocStream.incrementalDedupSink(indexDir, pairsDir,
      "doc_id", "text", NumHashes, NumBands, MinJ)
    val batches = docs.grouped(4).toSeq.zipWithIndex
      .map { case (b, i) => (b.toDF("doc_id", "text"), i.toLong) }
    batches.foreach { case (df, id) => sink(df, id) }

    def allPairs() = pairSet(
      spark.read.parquet(s"$pairsDir/*-batch-*"))
    val expected = pairSet(TextOps.minhashDedup(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      NumHashes, NumBands, MinJ))
    assert(allPairs() == expected,
      s"stream=${allPairs()}\nfull=$expected")

    // replay of an applied batch: marker present, pure no-op
    sink(batches(1)._1, 1L)
    assert(allPairs() == expected, "replay changed the pair log")

    // crash simulation: the last batch's marker vanishes (crash
    // before the marker landed) — the redo must overwrite, not
    // append, and converge to the same state
    val lastId = batches.last._2
    Files.delete(Paths.get(indexDir, s"done-default-$lastId"))
    sink(batches.last._1, lastId)
    assert(allPairs() == expected, "crash redo diverged")
    assert(Files.exists(Paths.get(indexDir, s"done-default-$lastId")))

    // the final on-disk index equals a from-scratch index over all
    // docs fed so far (so the NEXT batch sees the whole corpus)
    val lastSeq = Files.readString(
      Paths.get(indexDir, s"done-default-$lastId")).trim.toLong
    assert(lastSeq == batches.size,
      s"expected ${batches.size} published versions, marker says $lastSeq")
    val idx = TextOps.loadMinhashIndex(spark, s"$indexDir/v$lastSeq")
    val scratch = TextOps.minhashIndex(docs.toDF("doc_id", "text"),
      "doc_id", "text", NumHashes, NumBands)
    def rows(df: DataFrame) = df.collect().map(_.toSeq.map {
      case a: Seq[_] => a.toList
      case x => x
    }).toSet
    assert(rows(idx.members) == rows(scratch.members))
    assert(rows(idx.repToks) == rows(scratch.repToks))
    assert(rows(idx.repBands) == rows(scratch.repBands))
    graft.engine.Caches.drain(spark)
  }

  test("a fresh-checkpoint restart (new writer id, batch ids back " +
      "at 0) is NOT swallowed as a replay and continues the chain") {
    val work = Files.createTempDirectory("graft-incr-writer").toString
    val indexDir = s"$work/index"
    val pairsDir = s"$work/pairs"
    // incarnation 1 applies the first 5 docs as its batch 0...
    val sinkA = DocStream.incrementalDedupSink(indexDir, pairsDir,
      "doc_id", "text", NumHashes, NumBands, MinJ, writerId = "qA")
    sinkA(docs.take(5).toDF("doc_id", "text"), 0L)
    // ...then the checkpoint is lost; the restarted query gets a new
    // writer id and redelivers NEW data as ITS batch 0
    val sinkB = DocStream.incrementalDedupSink(indexDir, pairsDir,
      "doc_id", "text", NumHashes, NumBands, MinJ, writerId = "qB")
    sinkB(docs.drop(5).toDF("doc_id", "text"), 0L)
    val expected = pairSet(TextOps.minhashDedup(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      NumHashes, NumBands, MinJ))
    val got = pairSet(spark.read.parquet(s"$pairsDir/*-batch-*"))
    assert(got == expected,
      s"restart under a new writer lost data: got=$got expected=$expected")
    // the chain continued: two published versions, the second writer's
    // marker points at v2
    val seqB = Files.readString(
      Paths.get(indexDir, "done-qB-0")).trim.toLong
    assert(seqB == 2L, s"expected v2 from the second writer, got v$seqB")
    graft.engine.Caches.drain(spark)
  }

  test("save/load round-trips an index and the loaded index drives " +
      "incremental dedup identically") {
    val dir = Files.createTempDirectory("graft-idx-io").toString
    val corpus = docs.take(5).toDF("doc_id", "text")
    val batch = docs.drop(5).toDF("doc_id", "text")
    val mem = TextOps.minhashIndex(corpus, "doc_id", "text",
      NumHashes, NumBands)
    mem.save(dir)
    val loaded = TextOps.loadMinhashIndex(spark, dir)
    val a = pairSet(TextOps.minhashDedupIncremental(mem, batch,
      "doc_id", "text", MinJ))
    val b = pairSet(TextOps.minhashDedupIncremental(loaded, batch,
      "doc_id", "text", MinJ))
    assert(a == b && a.nonEmpty)
    graft.engine.Caches.drain(spark)
  }
}
