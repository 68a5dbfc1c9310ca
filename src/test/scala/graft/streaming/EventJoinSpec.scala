package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class EventJoinSpec extends SparkSpec {
  private val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private def ts(min: Int) =
    new java.sql.Timestamp(t0.getTime + min * 60000L)

  test("stream-stream interval join: window + user matching across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val clicks = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = EventJoin.purchasesWithRecentClicks(
      purchases.toDF().toDF("p_user", "p_ts", "p_value"),
      clicks.toDF().toDF("c_user", "c_ts", "c_value"),
      windowMinutes = 30, watermark = "10 minutes")

    val query = out.writeStream
      .format("memory").queryName("attributed")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // clicks arrive first (separate micro-batch from the purchases)
      clicks.addData(Seq(
        (1L, ts(0), 1.0),   // inside the 30-min lookback of ts(20)
        (1L, ts(15), 2.0),  // inside
        (1L, ts(21), 3.0),  // AFTER the purchase → no match
        (2L, ts(18), 4.0))) // other user → no match for user 1
      query.processAllAvailable()
      purchases.addData(Seq(
        (1L, ts(20), 100.0),
        (3L, ts(20), 300.0))) // user with no clicks → inner join drops
      query.processAllAvailable()

      val got = spark.table("attributed").collect()
        .map(r => (r.getLong(0), r.getTimestamp(3), r.getDouble(4)))
        .toSet
      assert(got === Set(
        (1L, ts(0), 1.0),
        (1L, ts(15), 2.0)))

      // a click far outside any purchase's window never joins, even
      // within the same batch as a later purchase
      clicks.addData(Seq((1L, ts(100), 9.0)))
      purchases.addData(Seq((1L, ts(200), 500.0)))
      query.processAllAvailable()
      assert(spark.table("attributed").count() === 2L)
    } finally query.stop()
  }

  test("left-outer interval join: unmatched purchases emit NULL clicks, " +
      "state evicted past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val clicks = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = EventJoin.purchasesWithRecentClicksOuter(
      purchases.toDF().toDF("p_user", "p_ts", "p_value"),
      clicks.toDF().toDF("c_user", "c_ts", "c_value"),
      windowMinutes = 30, watermark = "10 minutes")

    val query = out.writeStream
      .format("memory").queryName("attributed_outer")
      .outputMode(OutputMode.Append())
      .start()
    try {
      clicks.addData(Seq((1L, ts(0), 1.0)))
      query.processAllAvailable()
      purchases.addData(Seq(
        (1L, ts(20), 100.0),  // matches the click at ts(0)
        (3L, ts(20), 300.0))) // NO clicks → must still emit (outer)
      query.processAllAvailable()

      // advance both watermarks far past ts(20)+window so the
      // unmatched purchase's null row is forced out and old state
      // becomes provably dead
      clicks.addData(Seq((9L, ts(500), 9.0)))
      purchases.addData(Seq((9L, ts(500), 9.0)))
      query.processAllAvailable()
      clicks.addData(Seq((9L, ts(520), 9.5)))
      purchases.addData(Seq((9L, ts(520), 9.5)))
      query.processAllAvailable()

      val rows = spark.table("attributed_outer").collect()
        .map(r => (r.getLong(0),
          Option(r.getTimestamp(3)), Option(r.get(4))))
      // matched purchase carries the click; unmatched emits ONE null row
      assert(rows.count(r => r._1 == 1L && r._2.contains(ts(0))) === 1)
      assert(rows.count(r => r._1 == 3L && r._2.isEmpty && r._3.isEmpty)
        === 1)

      // state eviction: everything at/before ts(20) is past the
      // watermark (ts(520) - 10min) — only the recent rows may remain
      val state = query.lastProgress.stateOperators
      assert(state.nonEmpty)
      val buffered = state map (_.numRowsTotal)
      assert(buffered.sum <= 4,
        s"state not evicted: ${buffered.mkString(",")} rows buffered")
    } finally query.stop()
  }
}
