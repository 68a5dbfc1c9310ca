package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class DocStreamSpec extends SparkSpec {
  test("streaming exact dedup: first occurrence survives, repeats drop") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Int) =
      new java.sql.Timestamp(t0.getTime + min * 60000L)

    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "event_time")
    val out = DocStream.dedupStream(docs, "doc_id", "text", "10 minutes")

    val query = out.writeStream
      .format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: two distinct texts + an in-batch duplicate
      input.addData(Seq(
        (1L, "alpha doc", ts(0)),
        (2L, "beta doc", ts(1)),
        (3L, "alpha doc", ts(2)))) // dup of doc 1
      query.processAllAvailable()
      // batch 2: cross-batch duplicate within the watermark + a new doc
      input.addData(Seq(
        (4L, "beta doc", ts(3)), // dup of doc 2
        (5L, "gamma doc", ts(4))))
      query.processAllAvailable()

      val ids = spark.table("dedup_stream")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 5L))

      // same duplicate-definition as the batch operator (md5 content)
      val hashes = spark.table("dedup_stream")
        .select("content_hash").collect().map(_.getString(0)).toSet
      assert(hashes.size === 3)
    } finally query.stop()
  }
}
