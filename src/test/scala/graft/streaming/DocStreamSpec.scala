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

  test("streaming signature dedup: token-set-equal docs drop, others pass") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Int) =
      new java.sql.Timestamp(t0.getTime + min * 60000L)

    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "event_time")
    val out = DocStream.signatureDedupStream(docs, "doc_id", "text",
      numHashes = 8, watermark = "10 minutes")
    val query = out.writeStream
      .format("memory").queryName("sig_dedup_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(Seq(
        (1L, "alpha beta gamma", ts(0)),
        // SAME TOKEN SET, different bytes — md5 dedup would keep it
        (2L, "gamma  beta alpha alpha", ts(1)),
        (3L, "wholly different words", ts(2))))
      query.processAllAvailable()
      input.addData(Seq(
        (4L, "beta gamma alpha", ts(3)), // cross-batch same set
        (5L, "yet another doc", ts(4)),
        // null-text docs must BOTH survive (batch emits no signature
        // for them → never duplicates of each other)
        (6L, null, ts(5)),
        (7L, null, ts(6))))
      query.processAllAvailable()
      val ids = spark.table("sig_dedup_stream")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 3L, 5L, 6L, 7L))
    } finally query.stop()
  }

  test("per-row signature equals the batch aggregate signature") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "one two three four"),
      (3L, "alpha alpha beta")).toDF("doc_id", "text")
    val perRow = graft.operators.TextOps
      .withMinhashSignature(docs, "text", 8)
      .select("doc_id", (0 until 8).map(k => s"sig$k"): _*)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(r.getLong).toSeq).toMap
    val batch = graft.operators.TextOps.minhashSignature(
      graft.operators.TextOps.tokenHashes(docs, "doc_id", "text"), 8)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(r.getLong).toSeq).toMap
    assert(perRow === batch)
  }
}
