package graft.streaming

import graft.geom.{RasterGrid, ZoneIndex}
import graft.operators.ZonalStats
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming tile ingest — beyond the reference (which is pure batch,
  * SURVEY.md "Streaming"): a training-data pipeline continuously
  * receives new tiles (new acquisitions) and keeps per-zone statistics
  * current. Structured Streaming gives this for free on top of the
  * batch kernel:
  *
  *   tiles stream (image_id, bytes, fmt, event_time)
  *     → per-tile flatMap kernel (same scanline code as batch)
  *     → watermarked event-time window × fid aggregation
  *     → incremental per-(window, fid) stats, late data dropped
  *       after the watermark
  *
  * The aggregation is algebraic (sum/min/max), so Spark maintains it
  * incrementally in the state store — no reprocessing of old tiles.
  */
object TileStream {

  /** `foreachBatch` sink that ingests a tile stream into a
    * [[graft.sources.TileTable]] with exactly-once table contents:
    *
    * {{{
    * tiles.writeStream
    *   .foreachBatch(TileStream.tableSink(root, writerId = appId))
    *   .option("checkpointLocation", ckpt)
    *   .start()
    * }}}
    *
    * `writerId` must be STABLE for the lifetime of one logical stream
    * (its checkpoint): replay detection is keyed by (writerId,
    * batchId), so a stream restarted from the SAME checkpoint (same
    * writer id, replayed batch ids) is idempotent, while a stream
    * restarted from a FRESH checkpoint (batch ids from 0 again) must
    * use a NEW writer id — a stable per-deployment app id, or the
    * streaming query id recorded at first start. */
  def tableSink(root: String, writerId: String)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    graft.sources.TileTable.appendBatch(batch.sparkSession, root,
      batch, batchId, writerId)
    ()
  }

  /** Streaming per-(window, fid) zonal statistics.
    *
    * @param tiles streaming DataFrame with (image_id, bytes, fmt,
    *              event_time: timestamp)
    * @param windowDuration e.g. "10 minutes"
    * @param watermark      allowed lateness, e.g. "5 minutes"
    */
  def windowedFidStats(tiles: DataFrame, bc: Broadcast[ZoneIndex],
      grid: RasterGrid, nodata: Option[Double], windowDuration: String,
      watermark: String): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val withTime = tiles.select(col("image_id"), col("bytes"), col("fmt"),
      col("event_time"))
      .as[(String, Array[Byte], String, java.sql.Timestamp)]
      .flatMap { case (id, bytes, fmt, t) =>
        ZonalStats.processTile(id, bytes, fmt, grid, bc.value, nodata,
          collectValues = false)
          .map(p => (t, p.fid, p.cnt, p.nodata, p.mn, p.mx, p.sum, p.sumsq))
      }
      .toDF("event_time", "fid", "cnt", "nodata", "mn", "mx", "sum", "sumsq")

    withTime
      // watermark must be applied AFTER the typed flatMap: the
      // SerializeFromObject it plans re-creates event_time, and a
      // watermark set upstream would be dropped from the new column —
      // leaving the windowed agg watermark-less (Append mode would
      // throw; Update would never evict state)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDuration), col("fid"))
      .agg(
        sum("cnt").as("cnt"),
        sum("nodata").as("nodata"),
        min("mn").as("mn"),
        max("mx").as("mx"),
        sum("sum").as("sum"),
        sum("sumsq").as("sumsq"))
      .select(col("window.start").as("window_start"), col("fid"),
        col("cnt"), col("nodata"), col("mn"), col("mx"), col("sum"),
        col("sumsq"))
  }
}
