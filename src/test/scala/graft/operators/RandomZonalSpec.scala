package graft.operators

import graft.SparkSpec
import graft.geom.{GeoTransform, RasterGrid, Zone}
import graft.oracle.RefOracle
import graft.synth.Synth
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

/** Property-style parity (SURVEY.md §5.3): seeded random zone sets —
  * non-pixel-aligned rects, random convex polygons, multiparts — on
  * several grids (incl. a south-up, positive-py one). The engine's
  * scanline rasterizer must agree with the oracle's plain JTS
  * `contains` on every pixel-derived statistic. Random float vertices
  * almost surely avoid center/boundary ties, so the center rule is
  * well-defined.
  */
class RandomZonalSpec extends SparkSpec {
  private val gf = new GeometryFactory()

  private def randomZones(rnd: scala.util.Random, grid: RasterGrid,
      n: Int): Seq[Zone] = {
    val env = grid.rasterEnvelope
    def rx() = env.getMinX + rnd.nextDouble() * env.getWidth
    def ry() = env.getMinY + rnd.nextDouble() * env.getHeight
    (1 to n).map { fid =>
      val kind = rnd.nextInt(3)
      val geom = kind match {
        case 0 => // random rect (not pixel aligned)
          val (x0, x1) = { val a = rx(); val b = rx(); (math.min(a, b), math.max(a, b)) }
          val (y0, y1) = { val a = ry(); val b = ry(); (math.min(a, b), math.max(a, b)) }
          gf.createPolygon(Array(new Coordinate(x0, y0),
            new Coordinate(x1, y0), new Coordinate(x1, y1),
            new Coordinate(x0, y1), new Coordinate(x0, y0)))
        case 1 => // random convex polygon (hull of 6 points)
          val pts = Array.fill(6)(new Coordinate(rx(), ry()))
          gf.createMultiPointFromCoords(pts).convexHull()
        case _ => // multipolygon of two small rects
          def rect() = {
            val cx = rx(); val cy = ry()
            val w = env.getWidth * (0.01 + rnd.nextDouble() * 0.1)
            val h = env.getHeight * (0.01 + rnd.nextDouble() * 0.1)
            gf.createPolygon(Array(new Coordinate(cx, cy),
              new Coordinate(cx + w, cy), new Coordinate(cx + w, cy + h),
              new Coordinate(cx, cy + h), new Coordinate(cx, cy)))
          }
          gf.createMultiPolygon(Array(rect(), rect()))
      }
      geom match {
        case p: org.locationtech.jts.geom.Polygon =>
          Zone(fid.toLong, s"g${fid % 4}", p)
        case mp => Zone(fid.toLong, s"g${fid % 4}", mp)
      }
    }
  }

  private def check(grid: RasterGrid, seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val zones = randomZones(rnd, grid, 8)
    val tiles = Synth.tiles(spark, grid)
    val res = ZonalEngine.run(spark, tiles, zones, grid, Some(-9999.0),
      Seq(25.0), simplify = false)
    val got = res.collect().map { r =>
      (Option(r.getAs[String]("group")), r.getAs[Long]("count"),
        r.getAs[Long]("nodata_count"), r.getAs[Double]("sum"),
        Option(r.getAs[Any]("min")), Option(r.getAs[Any]("max")),
        Option(r.getAs[Any]("p25")))
    }.toSet
    val exp = RefOracle.zonalStats(grid, Synth.value, zones,
      Some(-9999.0), Seq(25.0), simplify = false).map { case (g, s) =>
      (g, s.count, s.nodataCount, s.sum,
        s.min.map(_.asInstanceOf[Any]), s.max.map(_.asInstanceOf[Any]),
        s.pcts.head.map(_.asInstanceOf[Any]))
    }.toSet
    assert(got === exp, s"seed=$seed grid=$grid")
  }

  private val northUp = RasterGrid(
    GeoTransform(-180.0, 5.625, 0.0, 90.0, 0.0, -2.8125), 64, 64, 16, 16)
  // south-up grid (positive py) exercises the axis-swap branches
  private val southUp = RasterGrid(
    GeoTransform(-180.0, 5.625, 0.0, -90.0, 0.0, 2.8125), 64, 64, 16, 16)

  test("random zones match oracle on the north-up grid") {
    for (seed <- 1L to 8L) check(northUp, seed)
  }

  test("random zones match oracle on the south-up grid") {
    for (seed <- 11L to 16L) check(southUp, seed)
  }

  /** Adversarial tie load: EVERY vertex sits on a pixel center, so
    * every edge is a boundary-tie generator for the top-left rule —
    * random center-aligned rects (incl. 1-px), and 45° right
    * triangles in all four orientations (exact diagonal crossings:
    * slope ±1 with dyadic pixel sizes keeps the crossing arithmetic
    * bit-exact). The oracle decides the same ties via the
    * lexicographic nudge — an independent formulation. */
  private def tieZones(rnd: scala.util.Random, grid: RasterGrid,
      n: Int): Seq[Zone] = {
    def pt(c: Int, r: Int) = new Coordinate(
      grid.gt.pixelCenterX(c), grid.gt.pixelCenterY(r))
    def poly(ps: Coordinate*) =
      gf.createPolygon((ps :+ ps.head).toArray)
    (1 to n).map { fid =>
      val geom = rnd.nextInt(3) match {
        case 0 =>
          val c0 = rnd.nextInt(grid.widthPx - 2)
          val c1 = c0 + 1 + rnd.nextInt(grid.widthPx - 1 - c0)
          val r0 = rnd.nextInt(grid.heightPx - 2)
          val r1 = r0 + 1 + rnd.nextInt(grid.heightPx - 1 - r0)
          poly(pt(c0, r0), pt(c1, r0), pt(c1, r1), pt(c0, r1))
        case 1 =>
          val s = 2 + rnd.nextInt(16)
          val c = rnd.nextInt(grid.widthPx - s - 1)
          val r = rnd.nextInt(grid.heightPx - s - 1)
          rnd.nextInt(4) match {
            case 0 => poly(pt(c, r), pt(c + s, r), pt(c, r + s))
            case 1 => poly(pt(c, r), pt(c + s, r + s), pt(c + s, r))
            case 2 => poly(pt(c, r), pt(c + s, r + s), pt(c, r + s))
            case _ => poly(pt(c + s, r), pt(c + s, r + s), pt(c, r + s))
          }
        case _ => // degenerate 1-px center rect
          val c = rnd.nextInt(grid.widthPx - 1)
          val r = rnd.nextInt(grid.heightPx - 1)
          poly(pt(c, r), pt(c + 1, r), pt(c + 1, r + 1), pt(c, r + 1))
      }
      Zone(fid.toLong, s"g${fid % 3}", geom)
    }
  }

  private def checkTies(grid: RasterGrid, seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val zones = tieZones(rnd, grid, 10)
    val tiles = Synth.tiles(spark, grid)
    val res = ZonalEngine.run(spark, tiles, zones, grid, Some(-9999.0),
      Nil, simplify = false)
    val got = res.collect().map { r =>
      (Option(r.getAs[String]("group")), r.getAs[Long]("count"),
        r.getAs[Long]("nodata_count"), r.getAs[Double]("sum"),
        Option(r.getAs[Any]("min")), Option(r.getAs[Any]("max")))
    }.toSet
    val exp = RefOracle.zonalStats(grid, Synth.value, zones,
      Some(-9999.0), Nil, simplify = false).map { case (g, s) =>
      (g, s.count, s.nodataCount, s.sum,
        s.min.map(_.asInstanceOf[Any]), s.max.map(_.asInstanceOf[Any]))
    }.toSet
    assert(got === exp, s"tie seed=$seed grid=$grid")
  }

  test("tie-saturated zones match oracle on the north-up grid") {
    for (seed <- 21L to 28L) checkTies(northUp, seed)
  }

  test("tie-saturated zones match oracle on the south-up grid") {
    for (seed <- 31L to 36L) checkTies(southUp, seed)
  }
}
