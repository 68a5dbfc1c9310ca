package graft.streaming

import graft.SparkSpec
import graft.engine.Fixtures
import graft.geom.{Zone, ZoneIndex}
import graft.operators.ZonalStats
import graft.synth.Synth
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class TileStreamSpec extends SparkSpec {
  test("streaming windowed fid stats converge to the batch kernel's") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val grid = Synth.testGrid
    val zones = Fixtures.zonesBasic(grid)
      .map(z => z.copy(geom = Zone.simplifyHalfPixel(z.geom, grid.gt.px)))
    val bc = spark.sparkContext.broadcast(new ZoneIndex(zones.toArray))

    // stream the 64 tiles in two micro-batches, all in one window
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val rows = (for (tr <- 0 until grid.tilesY; tc <- 0 until grid.tilesX)
      yield {
        val t = Synth.makeTile(grid, tr, tc, "raw")
        (t.image_id, t.bytes, t.fmt, base)
      }).toVector

    val input = MemoryStream[(String, Array[Byte], String,
      java.sql.Timestamp)]
    val streamDf = input.toDF()
      .toDF("image_id", "bytes", "fmt", "event_time")
    val out = TileStream.windowedFidStats(streamDf, bc, grid,
      Some(-9999.0), "10 minutes", "5 minutes")

    val query = out.writeStream
      .format("memory").queryName("fidstats")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(rows.take(30))
      query.processAllAvailable()
      input.addData(rows.drop(30))
      query.processAllAvailable()

      val got = spark.table("fidstats")
        .collect().map(r => r.getAs[Long]("fid") ->
          (r.getAs[Long]("cnt"), r.getAs[Double]("sum"))).toMap

      // batch reference over the same tiles
      val batch = ZonalStats.fidStats(ZonalStats.tilePartials(
        Synth.tiles(spark, grid), bc, grid, Some(-9999.0),
        collectValues = false))
        .collect().map(r => r.getAs[Long]("fid") ->
          (r.getAs[Long]("cnt"), r.getAs[Double]("sum"))).toMap

      assert(got === batch)
    } finally query.stop()
  }

  test("append mode: watermark survives the flatMap, closed windows emit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val grid = Synth.testGrid
    val zones = Fixtures.zonesBasic(grid)
      .map(z => z.copy(geom = Zone.simplifyHalfPixel(z.geom, grid.gt.px)))
    val bc = spark.sparkContext.broadcast(new ZoneIndex(zones.toArray))

    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val late = java.sql.Timestamp.valueOf("2026-01-01 00:30:00")
    val rows = (for (tr <- 0 until grid.tilesY; tc <- 0 until grid.tilesX)
      yield {
        val t = Synth.makeTile(grid, tr, tc, "raw")
        (t.image_id, t.bytes, t.fmt, base)
      }).toVector

    val input = MemoryStream[(String, Array[Byte], String,
      java.sql.Timestamp)]
    val streamDf = input.toDF()
      .toDF("image_id", "bytes", "fmt", "event_time")
    val out = TileStream.windowedFidStats(streamDf, bc, grid,
      Some(-9999.0), "10 minutes", "5 minutes")

    // Append mode REQUIRES a watermark on the agg — this .start()
    // throws AnalysisException if the watermark was lost upstream
    val query = out.writeStream
      .format("memory").queryName("fidstats_append")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(rows)
      query.processAllAvailable()
      // nothing emitted yet: the base window is still open
      assert(spark.table("fidstats_append").count() === 0L)

      // an event 30 min later pushes the watermark past the base
      // window's end → the base window closes, its state is evicted
      // and its finalized rows are appended
      val t = Synth.makeTile(grid, 0, 0, "raw")
      input.addData(Seq((t.image_id, t.bytes, t.fmt, late)))
      query.processAllAvailable()

      val got = spark.table("fidstats_append")
        .where(org.apache.spark.sql.functions.col("window_start") === base)
        .collect().map(r => r.getAs[Long]("fid") ->
          (r.getAs[Long]("cnt"), r.getAs[Double]("sum"))).toMap
      val batch = ZonalStats.fidStats(ZonalStats.tilePartials(
        Synth.tiles(spark, grid), bc, grid, Some(-9999.0),
        collectValues = false))
        .collect().map(r => r.getAs[Long]("fid") ->
          (r.getAs[Long]("cnt"), r.getAs[Double]("sum"))).toMap
      assert(got === batch)
    } finally query.stop()
  }
}
