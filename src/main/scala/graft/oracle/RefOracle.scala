package graft.oracle

import graft.geom._
import graft.operators.{NumpyPercentile, ZonalStats}
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

/** Single-threaded, brute-force reimplementation of the reference's
  * `fast_zonal_statistics` semantics (`/root/reference/runner.py:
  * 264-926`) used as the golden oracle in tests (SURVEY.md §5.1).
  * Deliberately naive: plain JTS `Geometry.contains` per pixel center
  * (a different code path from the engine's indexed locators), dict
  * accumulation in reference order, no Spark.
  */
object RefOracle {

  final case class GroupStats(
      min: Option[Double], max: Option[Double], count: Long,
      nodataCount: Long, validCount: Long, sum: Double,
      stdev: Option[Double], pcts: Seq[Option[Double]])

  private final class FidAcc {
    var min: Option[Double] = None
    var max: Option[Double] = None
    var count = 0L
    var nodata = 0L
    var sum = 0.0
    var sumsq = 0.0
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
  }

  /** Pixel-center membership with the raster top-left tie rule, as an
    * INDEPENDENT formulation from the engine's scanline arithmetic:
    * plain JTS containment of the center, and for centers exactly ON
    * the boundary, containment of the center under a LEXICOGRAPHIC
    * pixel-space perturbation (+δ right, +δ² down): the x-nudge
    * decides every non-horizontal edge (left edge → enters, right →
    * exits, and a diagonal edge cannot be collinear with the nudge
    * because the y-component is orders smaller), while the tiny
    * y-nudge breaks exactly-horizontal ties (top edge → enters,
    * bottom → exits). Limit: an edge with |pixel slope| < ~1e-5
    * (sub-pixel rise over ~10^5 px) through a center would be decided
    * by the wrong component — below the precision of the scanline
    * arithmetic itself. */
  private def containsTopLeft(geom: org.locationtech.jts.geom.Geometry,
      gf: GeometryFactory, grid: RasterGrid, cx: Double,
      cy: Double): Boolean = {
    val p = gf.createPoint(new Coordinate(cx, cy))
    if (geom.contains(p)) true
    else if (!geom.intersects(p)) false // strictly outside
    else {
      // the y-nudge must survive fp addition: at projected
      // coordinates (|cy| ~ 1e6-1e7, metre pixels) py*1e-12 rounds
      // to exactly cy (3e-11 < ulp(1e6) ≈ 1.2e-10) and horizontal
      // ties would be misdecided — floor it at a few ulps of cy
      // while keeping it orders below the x-nudge's pixel fraction
      val dy = math.signum(grid.gt.py) * math.max(
        math.abs(grid.gt.py) * 1e-12, 4 * Math.ulp(cy))
      geom.contains(gf.createPoint(new Coordinate(
        cx + grid.gt.px * 1e-7, cy + dy)))
    }
  }

  def zonalStats(grid: RasterGrid, valueFn: (Int, Int) => Float,
      zonesRaw: Seq[Zone], nodata: Option[Double],
      percentilesRaw: Seq[Double] = Nil,
      simplify: Boolean = true,
      lastWins: Boolean = false): Map[Option[String], GroupStats] = {
    val percentiles = percentilesRaw.distinct.sorted
    val zones =
      if (simplify) zonesRaw.map(z =>
        z.copy(geom = Zone.simplifyHalfPixel(z.geom, grid.gt.px)))
      else zonesRaw
    val fidToGroup = zones.map(z => z.fid -> Option(z.group)).toMap
    val groups = fidToGroup.values.toSet

    // bbox short-circuit (runner.py:409-450)
    val venv = new org.locationtech.jts.geom.Envelope()
    zones.foreach(z => venv.expandToInclude(z.geom.getEnvelopeInternal))
    if (!venv.intersects(grid.rasterEnvelope)) {
      return groups.map(g => g -> GroupStats(None, None, 0, 0, 0, 0.0,
        None, percentiles.map(_ => None))).toMap
    }

    val gf = new GeometryFactory()
    val acc = scala.collection.mutable.LinkedHashMap.empty[Long, FidAcc]

    // last-burn-wins mode: per-pixel owner map, zones burned in input
    // order, later burns overwrite (single-rasterize-pass semantics,
    // runner.py:483-484)
    val ownerOf: Option[(Int, Int) => Option[Long]] =
      if (!lastWins) None
      else {
        val owner = scala.collection.mutable.HashMap.empty[(Int, Int), Long]
        for (z <- zones) {
          val env = z.geom.getEnvelopeInternal
          val (c0, c1) = grid.centerColRange(env.getMinX, env.getMaxX)
          val (r0, r1) = grid.centerRowRange(env.getMinY, env.getMaxY)
          for (gr <- r0 to r1; gc <- c0 to c1) {
            if (containsTopLeft(z.geom, gf, grid,
                grid.gt.pixelCenterX(gc), grid.gt.pixelCenterY(gr)))
              owner((gr, gc)) = z.fid
          }
        }
        Some((gr, gc) => owner.get((gr, gc)))
      }

    // "rasterize" pass: pixel center strictly interior (ALL_TOUCHED=FALSE)
    for (z <- zones) {
      val env = z.geom.getEnvelopeInternal
      val (c0, c1) = grid.centerColRange(env.getMinX, env.getMaxX)
      val (r0, r1) = grid.centerRowRange(env.getMinY, env.getMaxY)
      var any = false
      val a = new FidAcc
      val vals = scala.collection.mutable.ArrayBuffer.empty[Float]
      var gr = r0
      while (gr <= r1) {
        var gc = c0
        while (gc <= c1) {
          val assigned = ownerOf match {
            case Some(f) => f(gr, gc).contains(z.fid)
            case None => containsTopLeft(z.geom, gf, grid,
              grid.gt.pixelCenterX(gc), grid.gt.pixelCenterY(gr))
          }
          if (assigned) {
            any = true
            val v = valueFn(gr, gc)
            a.count += 1
            if (nodata.exists(n => ZonalStats.isCloseTo(v.toDouble, n)))
              a.nodata += 1
            else {
              val vd = v.toDouble
              a.min = Some(a.min.fold(vd)(math.min(_, vd)))
              a.max = Some(a.max.fold(vd)(math.max(_, vd)))
              a.sum += vd
              a.sumsq += (v * v).toDouble
              vals += v
            }
          }
          gc += 1
        }
        gr += 1
      }
      if (any) {
        if (vals.nonEmpty) a.chunks += vals.toArray
        acc(z.fid) = a
      }
    }

    // unset-FID envelope fallback (runner.py:697-811)
    for (z <- zones if !acc.contains(z.fid)) {
      var a: FidAcc = null
      for (part <- 0 until z.geom.getNumGeometries) {
        val e = z.geom.getGeometryN(part).getEnvelopeInternal
        val win = WindowMath.envelopeToWindow(e.getMinX, e.getMaxX,
          e.getMinY, e.getMaxY, grid.gt, grid.widthPx, grid.heightPx)
        if (!win.isEmpty) {
          if (a == null) { a = new FidAcc; acc(z.fid) = a }
          var nd = 0L
          var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
          var s = 0.0; var sq = 0.0
          val vals = scala.collection.mutable.ArrayBuffer.empty[Float]
          var gr = win.yoff
          while (gr < win.yoff + win.wy) {
            var gc = win.xoff
            while (gc < win.xoff + win.wx) {
              val v = valueFn(gr, gc)
              if (nodata.exists(n => ZonalStats.isCloseTo(v.toDouble, n)))
                nd += 1
              else {
                val vd = v.toDouble
                if (vd < mn) mn = vd
                if (vd > mx) mx = vd
                s += vd; sq += (v * v).toDouble
                vals += v
              }
              gc += 1
            }
            gr += 1
          }
          // scalars OVERWRITTEN per part — last nonempty part wins
          a.count = win.sizePixels
          a.nodata = nd
          if (vals.isEmpty) {
            a.min = Some(0.0); a.max = Some(0.0); a.sum = 0.0; a.sumsq = 0.0
          } else {
            a.min = Some(mn); a.max = Some(mx); a.sum = s; a.sumsq = sq
            a.chunks += vals.toArray // chunks accumulate across parts
          }
        }
      }
    }

    // group rollup (runner.py:848-889) + finalize (runner.py:906-917)
    final case class GAcc(var min: Option[Double] = None,
        var max: Option[Double] = None, var count: Long = 0,
        var nodata: Long = 0, var sum: Double = 0.0, var sumsq: Double = 0.0,
        chunks: scala.collection.mutable.ArrayBuffer[Array[Float]] =
          scala.collection.mutable.ArrayBuffer.empty)
    val g = scala.collection.mutable.LinkedHashMap.empty[Option[String], GAcc]
    groups.foreach(gv => g(gv) = GAcc())
    for (z <- zones) {
      val ga = g(fidToGroup(z.fid))
      val fa = acc.getOrElse(z.fid, new FidAcc)
      ga.count += fa.count
      ga.nodata += fa.nodata
      ga.sum += fa.sum
      ga.sumsq += fa.sumsq
      if (fa.count - fa.nodata > 0) {
        (fa.min, fa.max) match {
          case (Some(mn), Some(mx)) =>
            ga.min = Some(ga.min.fold(mn)(math.min(_, mn)))
            ga.max = Some(ga.max.fold(mx)(math.max(_, mx)))
          case _ =>
        }
      }
      ga.chunks ++= fa.chunks
    }

    g.map { case (gv, ga) =>
      val valid = ga.count - ga.nodata
      val stdev =
        if (valid > 0) {
          val mean = ga.sum / valid
          val variance = math.max(ga.sumsq / valid - mean * mean, 0.0)
          Some(math.sqrt(variance))
        } else None
      val pcts: Seq[Option[Double]] =
        if (percentiles.isEmpty || ga.chunks.isEmpty)
          percentiles.map(_ => None)
        else {
          val all = ga.chunks.toArray.flatten
          java.util.Arrays.sort(all)
          NumpyPercentile.compute(all, percentiles.toArray)
            .toSeq.map(Some(_))
        }
      gv -> GroupStats(ga.min, ga.max, ga.count, ga.nodata, valid,
        ga.sum, stdev, pcts)
    }.toMap
  }
}
