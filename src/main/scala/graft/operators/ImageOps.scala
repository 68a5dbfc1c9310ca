package graft.operators

import graft.functions.{functions => gf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Multimodal column operators: images are REAL (decode via the
  * ImageDecode Catalyst expression, resize/stats as codegen'd
  * higher-order functions over the pixel array); audio/video are
  * treated as opaque binary with typed metadata and DETERMINISTIC
  * STUB decoders (this container has no media libraries — the
  * Spark-side plumbing, schemas and batch shapes are real and
  * tested; swap the stub for a proper codec in production).
  */
object ImageOps {

  /** Decoded pixel array (float32) of a tile row. */
  def pixels(bytes: Column, fmt: Column): Column = gf.image_decode(bytes, fmt)

  /** Σ over the pixel array in double, sequential fold. */
  def pxSum(px: Column): Column =
    aggregate(px, lit(0.0), (acc, v) => acc + v.cast("double"))

  def pxMin(px: Column): Column = array_min(px).cast("double")
  def pxMax(px: Column): Column = array_max(px).cast("double")

  def pxCountEq(px: Column, value: Column): Column =
    size(filter(px, v => v === value)).cast("long")

  /** Nearest-neighbor downsample by integer `factor` (top-left pick):
    * out(r,c) = in(r*factor, c*factor). Pure array expression —
    * no UDF, stays in codegen. */
  def resizeNearest(px: Column, w: Int, h: Int, factor: Int): Column = {
    val ow = w / factor
    val oh = h / factor
    transform(sequence(lit(0), lit(ow * oh - 1)), i => {
      // Column `/` is double division — use floor for the row index
      val r = floor(i / lit(ow)).cast("int") * factor
      val c = (i % ow) * factor
      element_at(px, (r * w + c + 1).cast("int"))
    })
  }

  /** Per-tile decode + stats over a tile table (the library surface
    * for "decode / feature-extract" pipelines). */
  def tileStats(tiles: DataFrame, nodata: Double): DataFrame = {
    val px = pixels(col("bytes"), col("fmt"))
    val valid = filter(px, v => v =!= lit(nodata.toFloat))
    tiles.select(
      col("image_id"),
      pxCountEq(px, lit(nodata.toFloat)).as("nodata_px"),
      size(px).cast("long").as("total_px"),
      pxSum(valid).as("sum_px"),
      pxMin(valid).as("min_px"),
      pxMax(valid).as("max_px"))
  }
}

/** Deterministic STUB decoders for audio/video binary columns — the
  * real codecs are not available in this container; these define the
  * schema/partitioning/batch contract and a reproducible fake payload
  * so pipelines are testable end-to-end. */
object MultimodalStubs {

  /** STUB audio decode: interpret bytes as PCM16 little-endian.
    * (This part is real for actual PCM16; for compressed formats a
    * codec would replace it.) */
  def pcm16Samples(bytes: Array[Byte]): Array[Short] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val out = new Array[Short](bb.remaining())
    bb.get(out)
    out
  }

  /** Frame-sample every `stride`-th sample; returns (n_samples,
    * n_frames, checksum) — the shape a feature-extraction stage
    * consumes. */
  def frameSample(bytes: Array[Byte], stride: Int): (Long, Long, Long) = {
    val s = pcm16Samples(bytes)
    var i = 0
    var n = 0L
    var sum = 0L
    while (i < s.length) { n += 1; sum += s(i); i += stride }
    (s.length.toLong, n, sum)
  }

  /** STUB video decode: ??? in a real deployment. Here: a
    * deterministic fake that treats the binary as `frameCount`
    * equal-sized "frames" and returns per-frame byte checksums. */
  def videoFrameChecksums(bytes: Array[Byte], frameCount: Int): Array[Long] = {
    if (frameCount <= 0 || bytes.isEmpty) return Array.empty
    val frameLen = math.max(1, bytes.length / frameCount)
    (0 until frameCount).map { f =>
      val from = math.min(f * frameLen, bytes.length)
      val until = math.min((f + 1) * frameLen, bytes.length)
      var h = 1125899906842597L
      var i = from
      while (i < until) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
      h
    }.toArray
  }
}
