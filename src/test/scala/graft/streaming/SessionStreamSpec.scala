package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class SessionStreamSpec extends SparkSpec {
  private val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private def ts(min: Int) =
    new java.sql.Timestamp(t0.getTime + min * 60000L)

  test("custom-state sessionizer: in-stream closes + timeout closes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val out = SessionStream.sessions(events, gapMinutes = 30,
      watermark = "10 minutes")

    val query = out.writeStream
      .format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // user 1: [0, 5] then [50, 55]; user 2: [3]
      input.addData(Seq(
        (1L, ts(0)), (1L, ts(5)), (1L, ts(50)), (1L, ts(55)),
        (2L, ts(3))))
      query.processAllAvailable()
      // the in-batch gap closes user 1's first session immediately;
      // the post-batch watermark (55-10=45) is already past user 2's
      // gap horizon (3+30=33), so that session times out too — user
      // 1's open [50,55] (horizon 85) survives
      val early = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      assert(early === Set(
        (1L, ts(0), ts(5), 2L),
        (2L, ts(3), ts(3), 1L)))

      // watermark jump (event at +200 min → watermark +190) times out
      // the open sessions
      input.addData(Seq((3L, ts(200))))
      query.processAllAvailable()
      input.addData(Seq((3L, ts(201)))) // one more batch to flush timeouts
      query.processAllAvailable()

      val all = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      assert(all.contains((1L, ts(50), ts(55), 2L)))
      assert(all.contains((2L, ts(3), ts(3), 1L)))

      // agrees with the batch sessionizer's definition on closed data
      assert(all.filter(_._1 == 1L) ===
        Set((1L, ts(0), ts(5), 2L), (1L, ts(50), ts(55), 2L)))
    } finally query.stop()
  }
}
