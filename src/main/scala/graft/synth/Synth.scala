package graft.synth

import graft.functions.{ImageCodec, XXHash64}
import graft.geom.{GeoTransform, RasterGrid, Zone}
import graft.operators.ZonalStats
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One synthesized tile row — exactly the BASELINE.json input_hint
  * schema: (image_id, bytes, w, h, fmt, caption, phash). */
final case class TileRow(image_id: String, bytes: Array[Byte], w: Int,
    h: Int, fmt: String, caption: String, phash: Long)

/** Deterministic tile-table + zone synthesis (FIXTURES.md). No RNG,
  * no wall-clock: every value is a pure function of (row, col), so
  * runs are byte-stable and resume/re-run tests can compare outputs
  * exactly. The same generator scales from the 16k-pixel unit grid to
  * the multi-million-pixel bench grid.
  */
object Synth {

  /** Unit-test grid: whole world as 128×128 px in 8×8 tiles of 16². */
  val testGrid: RasterGrid = RasterGrid(
    GeoTransform(-180.0, 2.8125, 0.0, 90.0, 0.0, -1.40625),
    widthPx = 128, heightPx = 128, tileW = 16, tileH = 16)

  val Nodata: Float = -9999.0f

  /** Pixel value at global (row, col): small-integer field with a
    * sparse nodata lattice and a solid nodata block in the south-east
    * corner (relative to a 128-unit pattern period so every grid size
    * has all features). Integer-valued by construction → float32,
    * float64, DuckDB and Spark all agree bit-exactly. */
  def value(gr: Int, gc: Int): Float = {
    val pr = gr % 128; val pc = gc % 128
    if (pr >= 120 && pc >= 120) Nodata
    else if ((gr * 7 + gc * 13) % 23 == 0) Nodata
    else ((gr * 31 + gc * 17) % 97).toFloat
  }

  /** DuckDB SQL expression computing [[value]] for columns gr/gc. */
  def valueSql(gr: String = "gr", gc: String = "gc"): String =
    s"CASE WHEN ($gr % 128) >= 120 AND ($gc % 128) >= 120 THEN -9999.0 " +
      s"WHEN (($gr*7 + $gc*13) % 23) = 0 THEN -9999.0 " +
      s"ELSE CAST((($gr*31 + $gc*17) % 97) AS DOUBLE) END"

  /** Alternative deterministic pixel field (a second "raster" for
    * multi-raster jobs); same nodata value, different lattice. */
  def value2(gr: Int, gc: Int): Float =
    if ((gr + gc) % 31 == 0) Nodata
    else ((gr * 13 + gc * 29) % 89).toFloat

  def valueSql2(gr: String = "gr", gc: String = "gc"): String =
    s"CASE WHEN (($gr + $gc) % 31) = 0 THEN -9999.0 " +
      s"ELSE CAST((($gr*13 + $gc*29) % 89) AS DOUBLE) END"

  /** Second-band pixel field with its OWN nodata value (-7777):
    * multi-band rasters carry per-band nodata in the reference
    * (`runner.py:295-296`), so the fixture bands must differ. */
  val NodataB2: Float = -7777.0f
  def valueB2(gr: Int, gc: Int): Float = {
    val v = value2(gr, gc)
    if (v == Nodata) NodataB2 else v
  }
  def valueB2Sql(gr: String = "gr", gc: String = "gc"): String =
    s"CASE WHEN (($gr + $gc) % 31) = 0 THEN -7777.0 " +
      s"ELSE CAST((($gr*13 + $gc*29) % 89) AS DOUBLE) END"

  /** Pixel function by variant id (0 = [[value]], 1 = [[value2]],
    * 2 = [[valueB2]]). */
  def valueFn(variant: Int): (Int, Int) => Float =
    variant match {
      case 0 => value
      case 1 => value2
      case 2 => valueB2
    }

  def tilePixels(grid: RasterGrid, tr: Int, tc: Int,
      variant: Int = 0): Array[Float] = {
    val f = valueFn(variant)
    val px = new Array[Float](grid.tileW * grid.tileH)
    var i = 0
    while (i < px.length) {
      px(i) = f(tr * grid.tileH + i / grid.tileW,
        tc * grid.tileW + i % grid.tileW)
      i += 1
    }
    px
  }

  def makeTile(grid: RasterGrid, tr: Int, tc: Int, fmt: String,
      variant: Int = 0): TileRow = {
    val px = tilePixels(grid, tr, tc, variant)
    val raw = ImageCodec.encodeRaw(px)
    val bytes = fmt match {
      case "raw" => raw
      case "png" => ImageCodec.encodePng(px, grid.tileW, grid.tileH)
      case "jpg" => ImageCodec.encodeJpg(px, grid.tileW, grid.tileH)
    }
    TileRow(ZonalStats.tileId(tr, tc), bytes, grid.tileW, grid.tileH, fmt,
      s"synthetic tile r$tr c$tc seed42", XXHash64.hash(raw, 42L))
  }

  /** Distributed synthesis of the full tile table (input_hint schema).
    * Tiles are generated inside executors from the tile index — the
    * driver never materializes pixel data, so the same code synthesizes
    * the bench-scale table. */
  def tiles(spark: SparkSession, grid: RasterGrid, fmt: String = "raw",
      variant: Int = 0): DataFrame = {
    import spark.implicits._
    val g = grid
    val f = fmt
    val v = variant
    spark.range(0, grid.numTiles)
      .as[Long]
      .map(i => makeTile(g, (i / g.tilesX).toInt, (i % g.tilesX).toInt, f, v))
      .toDF()
  }

  /** Lossy-codec fixture: each row carries the ground-truth RAW
    * encoding AND the JPEG encoding (quality 0.95) of the same
    * smooth linear-gradient field px(gr,gc) = gr + gc (range 0..254,
    * no nodata) — smooth so the codec sits far above the 40 dB gate,
    * and exactly replicable in SQL as `gr + gc`. */
  def lossyTiles(spark: SparkSession, grid: RasterGrid): DataFrame = {
    import spark.implicits._
    val g = grid
    spark.range(0, grid.numTiles).as[Long].map { i =>
      val tr = (i / g.tilesX).toInt
      val tc = (i % g.tilesX).toInt
      val px = new Array[Float](g.tileW * g.tileH)
      var j = 0
      while (j < px.length) {
        px(j) = ((tr * g.tileH + j / g.tileW) +
          (tc * g.tileW + j % g.tileW)).toFloat
        j += 1
      }
      (ZonalStats.tileId(tr, tc), ImageCodec.encodeRaw(px),
        ImageCodec.encodeJpg(px, g.tileW, g.tileH))
    }.toDF("image_id", "raw_bytes", "jpg_bytes")
  }

  /** Multi-band tile table: one row per (tile, band), with the band's
    * pixel field chosen by variant. Schema = input_hint + `band`. */
  def tilesMultiBand(spark: SparkSession, grid: RasterGrid,
      bandVariants: Seq[(Int, Int)], fmt: String = "raw"): DataFrame = {
    import spark.implicits._
    val g = grid
    val f = fmt
    val bv = bandVariants
    spark.range(0, grid.numTiles * bandVariants.size)
      .as[Long]
      .map { i =>
        val ti = i / bv.size
        val (band, variant) = bv((i % bv.size).toInt)
        val t = makeTile(g, (ti / g.tilesX).toInt, (ti % g.tilesX).toInt,
          f, variant)
        (t.image_id, t.bytes, t.w, t.h, t.fmt, t.caption, t.phash, band)
      }
      .toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        "band")
  }

  /** Deterministic PCM16-LE "audio track": sample i of track k is
    * ((k*7919 + i*37) % 1000) - 500 — replicable in plain SQL. */
  def pcm16Track(k: Long, nSamples: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(nSamples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nSamples) {
      bb.putShort((((k * 7919 + i * 37) % 1000) - 500).toShort)
      i += 1
    }
    bb.array()
  }

  /** A triangle-wave PCM16 clip compressed with IMA ADPCM
    * ([[graft.functions.AdpcmCodec]]) — 4 header bytes + one nibble
    * per sample after the first (~4:1 vs PCM16). Triangle (|((k·37 +
    * i·19) mod 2000) − 1000| − 500): slope ±19 with no mod-wrap
    * discontinuities, so the adaptive quantizer tracks it tightly and
    * a mean-abs-error quality gate is meaningful (and the formula is
    * plain SQL for the oracle). */
  def adpcmTrack(k: Long, nSamples: Int): Array[Byte] = {
    val samples = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) =
        (math.abs(((k * 37 + i * 19) % 2000) - 1000) - 500).toShort
      i += 1
    }
    graft.functions.AdpcmCodec.encode(samples)
  }

  /** The [[videoPngStream]] pixel field compressed with the
    * inter-frame delta codec ([[graft.functions.DeltaVideoCodec]]):
    * keyframe + P-frames of temporal deltas. Same formula, so the
    * same plain-SQL oracle applies. */
  def videoDeltaStream(k: Long, nFrames: Int, w: Int = 8,
      h: Int = 8): Array[Byte] = {
    val frames = (0 until nFrames).map { j =>
      val px = new Array[Int](w * h)
      var i = 0
      while (i < px.length) {
        val r = i / w; val c = i % w
        px(i) = ((k * 31 + j * 17 + r * 7 + c * 3) % 251).toInt
        i += 1
      }
      px
    }
    graft.functions.DeltaVideoCodec.encode(frames, w, h)
  }

  /** Deterministic "video": `nFrames` gray16 PNG frames concatenated
    * byte-wise (MJPEG-with-PNG layout; split on the PNG signature by
    * [[graft.operators.Video]]). Pixel (r, c) of frame j in video k =
    * (k·31 + j·17 + r·7 + c·3) mod 251 — replicable in plain SQL. */
  def videoPngStream(k: Long, nFrames: Int, w: Int = 8,
      h: Int = 8): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var j = 0
    while (j < nFrames) {
      val px = new Array[Float](w * h)
      var i = 0
      while (i < px.length) {
        val r = i / w; val c = i % w
        px(i) = ((k * 31 + j * 17 + r * 7 + c * 3) % 251).toFloat
        i += 1
      }
      out.write(ImageCodec.encodePng(px, w, h))
      j += 1
    }
    out.toByteArray
  }

  /** Rect zone addressed in PIXEL space: covers pixel centers with
    * col in [c0, c1) and row in [r0, r1). Pixel-boundary vertices ⇒
    * no center ever lies on a zone edge (FIXTURES.md §2). */
  def rectPx(grid: RasterGrid, fid: Long, group: String,
      c0: Int, r0: Int, c1: Int, r1: Int): Zone = {
    val x0 = grid.gt.cornerX(c0); val x1 = grid.gt.cornerX(c1)
    val y0 = grid.gt.cornerY(r0); val y1 = grid.gt.cornerY(r1)
    Zone.rect(fid, group, math.min(x0, x1), math.min(y0, y1),
      math.max(x0, x1), math.max(y0, y1))
  }
}
