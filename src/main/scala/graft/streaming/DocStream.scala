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
}
