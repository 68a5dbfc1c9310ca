package graft.geom

/** Z-order (Morton) quad-cell index over lon/lat, S2-style API.
  *
  * Provides the cell encoding the engine uses for range partitioning,
  * manifest pruning and join prefilters (the role GDAL's implicit
  * georeferencing plays in the reference rasterize join,
  * `/root/reference/runner.py:599-606`). Pure arithmetic, exact,
  * sortable int64; a Hilbert curve could drop in behind the same API.
  *
  * A cell id at `level` packs the interleaved (x, y) bits of the
  * quantized lon/lat. Ids are only comparable within one level; the
  * engine uses a single fixed level per table (stored in the table
  * manifest).
  */
object Morton {
  val MaxLevel = 30

  final val LonMin = -180.0
  final val LonMax = 180.0
  final val LatMin = -90.0
  final val LatMax = 90.0

  /** Quantize a coordinate to a cell ordinate in [0, 2^level). */
  def quantize(c: Double, min: Double, max: Double, level: Int): Long = {
    val n = 1L << level
    val raw = ((c - min) / (max - min) * n).toLong
    if (raw < 0) 0L else if (raw >= n) n - 1 else raw
  }

  /** Spread the low 32 bits of v into the even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Inverse of [[spread]]: collect the even bit positions. */
  def compact(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >> 16)) & 0x00000000ffffffffL
    x
  }

  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  def deinterleave(m: Long): (Long, Long) = (compact(m), compact(m >> 1))

  /** Cell id of the cell containing (lon, lat) at `level`. */
  def cellId(lon: Double, lat: Double, level: Int): Long = {
    val x = quantize(lon, LonMin, LonMax, level)
    val y = quantize(lat, LatMin, LatMax, level)
    interleave(x, y)
  }

  /** (lonMin, lonMax, latMin, latMax) bounds of a cell. */
  def cellBounds(cell: Long, level: Int): (Double, Double, Double, Double) = {
    val (x, y) = deinterleave(cell)
    val n = (1L << level).toDouble
    val lonW = (LonMax - LonMin) / n
    val latW = (LatMax - LatMin) / n
    (LonMin + x * lonW, LonMin + (x + 1) * lonW,
      LatMin + y * latW, LatMin + (y + 1) * latW)
  }

  def parent(cell: Long): Long = {
    val (x, y) = deinterleave(cell)
    interleave(x >> 1, y >> 1)
  }

  def children(cell: Long): Array[Long] = {
    val (x, y) = deinterleave(cell)
    val (cx, cy) = (x << 1, y << 1)
    Array(interleave(cx, cy), interleave(cx + 1, cy),
      interleave(cx, cy + 1), interleave(cx + 1, cy + 1))
  }

  /** Inclusive Morton-id ranges covering the axis-aligned box
    * [lonMin,lonMax]×[latMin,latMax] at `level`. Used for manifest
    * pruning and cell-range join prefilters. Produced by quadtree
    * descent merging fully-covered subtrees into single ranges, so
    * the output is short (<= a few dozen ranges for typical boxes).
    */
  def coverRanges(lonMin: Double, lonMax: Double, latMin: Double,
      latMax: Double, level: Int): Seq[(Long, Long)] = {
    val x0 = quantize(lonMin, LonMin, LonMax, level)
    val x1 = quantize(lonMax, LonMin, LonMax, level)
    val y0 = quantize(latMin, LatMin, LatMax, level)
    val y1 = quantize(latMax, LatMin, LatMax, level)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // Descend the implicit quadtree. A node is (lvl, cellAtLvl); its
    // Morton range at the target level is [cell << 2d, (cell+1) << 2d).
    def visit(lvl: Int, cx: Long, cy: Long): Unit = {
      val shift = level - lvl
      val nx0 = cx << shift; val nx1 = ((cx + 1) << shift) - 1
      val ny0 = cy << shift; val ny1 = ((cy + 1) << shift) - 1
      if (nx1 < x0 || nx0 > x1 || ny1 < y0 || ny0 > y1) return // disjoint
      val cell = interleave(cx, cy)
      if (nx0 >= x0 && nx1 <= x1 && ny0 >= y0 && ny1 <= y1) {
        // fully covered: one contiguous Morton range
        val lo = cell << (2 * shift)
        val hi = ((cell + 1L) << (2 * shift)) - 1
        out += ((lo, hi))
      } else if (lvl == level) {
        out += ((cell, cell))
      } else {
        visit(lvl + 1, cx << 1, cy << 1)
        visit(lvl + 1, (cx << 1) | 1, cy << 1)
        visit(lvl + 1, cx << 1, (cy << 1) | 1)
        visit(lvl + 1, (cx << 1) | 1, (cy << 1) | 1)
      }
    }
    visit(0, 0L, 0L)
    // merge adjacent ranges (quadtree emit order is Morton order per
    // sibling but not globally sorted; sort then merge)
    val sorted = out.sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for ((lo, hi) <- sorted) {
      if (merged.nonEmpty && merged.last._2 + 1 >= lo) {
        val (plo, phi) = merged.last
        merged(merged.size - 1) = (plo, math.max(phi, hi))
      } else merged += ((lo, hi))
    }
    merged.toSeq
  }

  /** [[coverRanges]] capped at `maxRanges` ranges (S2's max_cells
    * idea): Morton order fragments rectangles into many small runs,
    * which bloats pushed predicates; repeatedly merging the pair with
    * the smallest gap trades a few false-positive cells for a compact
    * filter. Correctness is unaffected — ranges only ever grow. */
  def coverRangesCapped(lonMin: Double, lonMax: Double, latMin: Double,
      latMax: Double, level: Int, maxRanges: Int = 16): Seq[(Long, Long)] = {
    var r = coverRanges(lonMin, lonMax, latMin, latMax, level).toBuffer
    while (r.size > maxRanges) {
      var bestI = 0
      var bestGap = Long.MaxValue
      var i = 0
      while (i < r.size - 1) {
        val gap = r(i + 1)._1 - r(i)._2
        if (gap < bestGap) { bestGap = gap; bestI = i }
        i += 1
      }
      r(bestI) = (r(bestI)._1, r(bestI + 1)._2)
      r.remove(bestI + 1)
    }
    r.toSeq
  }
}
