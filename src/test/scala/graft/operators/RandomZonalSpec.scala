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
}
