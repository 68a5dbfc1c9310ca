package graft.tools
import graft.engine.Fixtures
import graft.geom.{Zone, ZoneIndex}
import graft.streaming.TileStream
import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Drives the streaming ingest path end-to-end on a rate source:
  * synthetic tiles arrive continuously, windowed per-zone stats
  * update incrementally. Runs a few micro-batches then exits. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val grid = Synth.testGrid
    val zones = Fixtures.zonesBasic(grid)
      .map(z => z.copy(geom = Zone.simplifyHalfPixel(z.geom, grid.gt.px)))
    val bc = spark.sparkContext.broadcast(new ZoneIndex(zones.toArray))

    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "32").load()
    val g = grid
    val tiles = rate
      .select(col("timestamp"), (col("value") % g.numTiles).as("i"))
      .as[(java.sql.Timestamp, Long)]
      .map { case (t, i) =>
        val tile = Synth.makeTile(g, (i / g.tilesX).toInt,
          (i % g.tilesX).toInt, "raw")
        (tile.image_id, tile.bytes, tile.fmt, t)
      }
      .toDF("image_id", "bytes", "fmt", "event_time")

    val out = TileStream.windowedFidStats(tiles, bc, g, Some(-9999.0),
      "1 minute", "30 seconds")
    val q = out.writeStream.format("memory").queryName("live")
      .outputMode("complete").start()
    Thread.sleep(8000)
    q.processAllAvailable()
    val rows = spark.table("live").orderBy(col("fid"))
    println(s"[stream] ${rows.count()} (window,fid) rows after ~8s:")
    rows.show(6, false)
    q.stop()
    spark.stop()
  }
}
