package graft.geom

import org.locationtech.jts.geom.Envelope

/** GDAL-order geotransform: (x0, px, rx, y0, ry, py).
  * x = x0 + col*px + row*rx ; y = y0 + col*ry + row*py.
  * Mirrors the 6-tuple consumed at `/root/reference/runner.py:700`.
  * Only axis-aligned transforms (rx = ry = 0) are supported by the
  * engine; the fields are kept for fidelity of the window math.
  */
final case class GeoTransform(x0: Double, px: Double, rx: Double,
    y0: Double, ry: Double, py: Double) {
  require(rx == 0.0 && ry == 0.0, "rotated geotransforms unsupported")

  def pixelCenterX(col: Int): Double = x0 + (col + 0.5) * px
  def pixelCenterY(row: Int): Double = y0 + (row + 0.5) * py
  /** Pixel-corner coordinates (col/row may be a boundary index). */
  def cornerX(col: Int): Double = x0 + col.toDouble * px
  def cornerY(row: Int): Double = y0 + row.toDouble * py

  /** The reference casts the geotransform to float32 before the
    * envelope-fallback window math (`runner.py:700`) — replicate. */
  def toFloat32: GeoTransform = GeoTransform(
    x0.toFloat.toDouble, px.toFloat.toDouble, rx.toFloat.toDouble,
    y0.toFloat.toDouble, ry.toFloat.toDouble, py.toFloat.toDouble)
}

/** A pixel window (xoff, yoff, winXSize, winYSize), GDAL ReadAsArray
  * convention. */
final case class PixelWindow(xoff: Int, yoff: Int, wx: Int, wy: Int) {
  def isEmpty: Boolean = wx <= 0 || wy <= 0
  def sizePixels: Long = if (isEmpty) 0L else wx.toLong * wy
}

/** The global raster grid of a tile table: one logical raster of
  * `widthPx` × `heightPx` pixels, stored as `tileW` × `tileH` tiles.
  * Tiles are addressed (tileRow, tileCol) row-major, matching the
  * block iteration of `runner.py:542-545`.
  */
final case class RasterGrid(gt: GeoTransform, widthPx: Int, heightPx: Int,
    tileW: Int, tileH: Int) {
  require(widthPx % tileW == 0 && heightPx % tileH == 0,
    "grid must tile evenly")
  val tilesX: Int = widthPx / tileW
  val tilesY: Int = heightPx / tileH
  def numTiles: Long = tilesX.toLong * tilesY

  /** Geographic envelope of tile (tr, tc); handles negative px/py. */
  def tileEnvelope(tr: Int, tc: Int): Envelope = {
    val xa = gt.cornerX(tc * tileW); val xb = gt.cornerX((tc + 1) * tileW)
    val ya = gt.cornerY(tr * tileH); val yb = gt.cornerY((tr + 1) * tileH)
    new Envelope(math.min(xa, xb), math.max(xa, xb),
      math.min(ya, yb), math.max(ya, yb))
  }

  /** Full-raster envelope. */
  def rasterEnvelope: Envelope = {
    val xa = gt.cornerX(0); val xb = gt.cornerX(widthPx)
    val ya = gt.cornerY(0); val yb = gt.cornerY(heightPx)
    new Envelope(math.min(xa, xb), math.max(xa, xb),
      math.min(ya, yb), math.max(ya, yb))
  }

  /** Global pixel column range [c0, c1] whose CENTERS fall strictly
    * inside [xmin, xmax]; empty if c0 > c1. Exact double arithmetic —
    * used as the bbox prefilter before per-pixel PIP refinement. */
  def centerColRange(xmin: Double, xmax: Double): (Int, Int) = {
    // center(col) = x0 + (col+0.5)*px  (px may be negative)
    val a = (xmin - gt.x0) / gt.px - 0.5
    val b = (xmax - gt.x0) / gt.px - 0.5
    val (lo, hi) = if (a <= b) (a, b) else (b, a)
    // the range is a prefilter only — exact boundary exclusion is the
    // PIP test's job, so inclusive ceil/floor bounds are fine here
    var c0 = math.ceil(lo).toInt
    var c1 = math.floor(hi).toInt
    if (c0 < 0) c0 = 0
    if (c1 > widthPx - 1) c1 = widthPx - 1
    (c0, c1)
  }

  def centerRowRange(ymin: Double, ymax: Double): (Int, Int) = {
    val a = (ymin - gt.y0) / gt.py - 0.5
    val b = (ymax - gt.y0) / gt.py - 0.5
    val (lo, hi) = if (a <= b) (a, b) else (b, a)
    var r0 = math.ceil(lo).toInt
    var r1 = math.floor(hi).toInt
    if (r0 < 0) r0 = 0
    if (r1 > heightPx - 1) r1 = heightPx - 1
    (r0, r1)
  }
}

/** Envelope→pixel-window math of the unset-FID fallback pass,
  * bit-compatible with `/root/reference/runner.py:700-763`:
  *   - geotransform cast to float32, arithmetic in float64
  *     (numpy 1.26 promotion rules);
  *   - `int()` truncation toward zero for offsets, `ceil` for extents;
  *   - axis swap when px/py negative;
  *   - clamp to the raster, window dropped if empty.
  */
object WindowMath {
  def envelopeToWindow(envMinX: Double, envMaxX: Double, envMinY: Double,
      envMaxY: Double, gt: GeoTransform, rasterW: Int,
      rasterH: Int): PixelWindow = {
    val g = gt.toFloat32
    // runner.py:721-731 — swap so index math runs low→high in pixel space
    val (ex0, ex1) = if (g.px < 0) (envMaxX, envMinX) else (envMinX, envMaxX)
    val (ey0, ey1) = if (g.py < 0) (envMaxY, envMinY) else (envMinY, envMaxY)
    var xoff = ((ex0 - g.x0) / g.px).toInt
    var yoff = ((ey0 - g.y0) / g.py).toInt
    var wx = math.ceil((ex1 - g.x0) / g.px).toInt - xoff
    var wy = math.ceil((ey1 - g.y0) / g.py).toInt - yoff
    if (xoff < 0) { wx += xoff; xoff = 0 }
    if (yoff < 0) { wy += yoff; yoff = 0 }
    if (xoff + wx > rasterW) wx = rasterW - xoff
    if (yoff + wy > rasterH) wy = rasterH - yoff
    PixelWindow(xoff, yoff, wx, wy)
  }
}
