package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class MortonSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("interleave/deinterleave roundtrip") {
    for (_ <- 0 until 2000) {
      val x = rnd.nextLong() & ((1L << 30) - 1)
      val y = rnd.nextLong() & ((1L << 30) - 1)
      assert(Morton.deinterleave(Morton.interleave(x, y)) === ((x, y)))
    }
  }

  test("cellBounds contains the generating point") {
    for (_ <- 0 until 2000) {
      val lon = rnd.nextDouble() * 359.8 - 179.9
      val lat = rnd.nextDouble() * 179.8 - 89.9
      val level = 1 + rnd.nextInt(20)
      val cell = Morton.cellId(lon, lat, level)
      val (x0, x1, y0, y1) = Morton.cellBounds(cell, level)
      assert(lon >= x0 && lon <= x1 && lat >= y0 && lat <= y1,
        s"($lon,$lat)@$level")
    }
  }

  test("parent contains child") {
    for (_ <- 0 until 500) {
      val lon = rnd.nextDouble() * 358 - 179
      val lat = rnd.nextDouble() * 178 - 89
      val child = Morton.cellId(lon, lat, 10)
      assert(Morton.parent(child) === Morton.cellId(lon, lat, 9))
    }
  }

  test("coverRanges covers exactly the envelope's cells") {
    val level = 6
    for (_ <- 0 until 300) {
      val x = rnd.nextDouble() * 320 - 170
      val y = rnd.nextDouble() * 140 - 80
      val w = 0.5 + rnd.nextDouble() * 30
      val h = 0.5 + rnd.nextDouble() * 25
      val ranges = Morton.coverRanges(x, x + w, y, y + h, level)
      for (fx <- Seq(0.01, 0.5, 0.99); fy <- Seq(0.01, 0.5, 0.99)) {
        val cell = Morton.cellId(x + fx * w, y + fy * h, level)
        assert(ranges.exists { case (lo, hi) => cell >= lo && cell <= hi },
          s"point not covered: box=($x,$y,$w,$h) f=($fx,$fy)")
      }
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 + 1 < l2, "ranges not merged")
        case _ =>
      }
    }
  }
}

class WindowMathSpec extends AnyFunSuite {
  private val gt = GeoTransform(-180.0, 2.8125, 0.0, 90.0, 0.0, -1.40625)

  test("sub-pixel sliver maps to its single pixel") {
    // sliver inside pixel col 5, row 10 (fixture s1)
    val x0 = -180.0 + 5.3 * 2.8125; val x1 = -180.0 + 5.45 * 2.8125
    val y0 = 90.0 - 10.4 * 1.40625; val y1 = 90.0 - 10.2 * 1.40625
    val w = WindowMath.envelopeToWindow(x0, x1, y0, y1, gt, 128, 128)
    assert(w === PixelWindow(5, 10, 1, 1))
  }

  test("window clamps to raster and drops when outside") {
    val w = WindowMath.envelopeToWindow(200.0, 210.0, 10.0, 20.0, gt, 128, 128)
    assert(w.isEmpty) // zone fully east of the raster
    val w2 = WindowMath.envelopeToWindow(-190.0, -175.0, 85.0, 95.0, gt, 128, 128)
    assert(w2.xoff === 0 && w2.yoff === 0 && !w2.isEmpty)
  }

  test("negative py flips the y envelope (reference axis swap)") {
    val w = WindowMath.envelopeToWindow(-180.0, 180.0, -90.0, 90.0, gt, 128, 128)
    assert(w === PixelWindow(0, 0, 128, 128))
  }

  test("float32 geotransform quirk: truncation uses float32-rounded gt") {
    val gtOdd = GeoTransform(-180.0, 0.1, 0.0, 90.0, 0.0, -0.1)
    val w = WindowMath.envelopeToWindow(-179.95, -179.65, 89.65, 89.95,
      gtOdd, 3600, 1800)
    assert(w.xoff === 0)
    assert(w.wx === math.ceil(((-179.65 - -180.0).toFloat.toDouble) /
      0.1f.toDouble).toInt)
  }

  test("pixel-center ranges are exact") {
    val grid = RasterGrid(gt, 128, 128, 16, 16)
    val (c0, c1) = grid.centerColRange(gt.cornerX(2), gt.cornerX(20))
    assert(c0 === 2 && c1 === 19)
    val (r0, r1) = grid.centerRowRange(gt.cornerY(12), gt.cornerY(2))
    assert(r0 === 2 && r1 === 11)
  }
}

class ZoneIndexSpec extends AnyFunSuite {
  test("coversRect equals prepared containsProperly (r8 kernel fast path)") {
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val rnd = new scala.util.Random(23)
    // zone shapes that exercise every branch: axis-aligned rects
    // (edges can coincide with probe rects), random convex-ish
    // polygons, a polygon with a hole, a multipolygon
    def randPoly(): org.locationtech.jts.geom.Geometry = {
      val cx = rnd.nextDouble() * 100; val cy = rnd.nextDouble() * 100
      val r = 5 + rnd.nextDouble() * 30
      val n = 5 + rnd.nextInt(6)
      val pts = (0 until n).map { k =>
        val a = 2 * math.Pi * k / n
        val rr = r * (0.6 + 0.4 * rnd.nextDouble())
        new org.locationtech.jts.geom.Coordinate(
          cx + rr * math.cos(a), cy + rr * math.sin(a))
      }
      gf.createPolygon((pts :+ pts.head).toArray)
    }
    val holed = {
      val shell = gf.createLinearRing(Array(
        new org.locationtech.jts.geom.Coordinate(10, 10),
        new org.locationtech.jts.geom.Coordinate(90, 10),
        new org.locationtech.jts.geom.Coordinate(90, 90),
        new org.locationtech.jts.geom.Coordinate(10, 90),
        new org.locationtech.jts.geom.Coordinate(10, 10)))
      val hole = gf.createLinearRing(Array(
        new org.locationtech.jts.geom.Coordinate(40, 40),
        new org.locationtech.jts.geom.Coordinate(60, 40),
        new org.locationtech.jts.geom.Coordinate(60, 60),
        new org.locationtech.jts.geom.Coordinate(40, 60),
        new org.locationtech.jts.geom.Coordinate(40, 40)))
      gf.createPolygon(shell, Array(hole))
    }
    val zones = (Seq(
      Zone.rect(0, "r", 20, 20, 80, 80).geom,
      Zone.rect(1, "r", 0, 0, 32, 32).geom, // probe-aligned edges
      holed,
      gf.createMultiPolygon(Array(
        gf.createPolygon(Array(
          new org.locationtech.jts.geom.Coordinate(0, 0),
          new org.locationtech.jts.geom.Coordinate(30, 0),
          new org.locationtech.jts.geom.Coordinate(30, 30),
          new org.locationtech.jts.geom.Coordinate(0, 30),
          new org.locationtech.jts.geom.Coordinate(0, 0))),
        gf.createPolygon(Array(
          new org.locationtech.jts.geom.Coordinate(60, 60),
          new org.locationtech.jts.geom.Coordinate(95, 60),
          new org.locationtech.jts.geom.Coordinate(95, 95),
          new org.locationtech.jts.geom.Coordinate(60, 95),
          new org.locationtech.jts.geom.Coordinate(60, 60))))))
      ++ (0 until 8).map(_ => randPoly()))
      .zipWithIndex.map { case (g, i) => Zone(i.toLong, s"z$i", g) }
    val idx = new ZoneIndex(zones.toArray)
    val prep = zones.map(z =>
      org.locationtech.jts.geom.prep.PreparedGeometryFactory
        .prepare(z.geom))
    var checked = 0; var covered = 0
    // probe rects: a regular tile-like lattice (8x8 rects) plus
    // random rects of varied size — includes rects sharing edges with
    // zone 1's boundary and rects inside the hole
    val probes =
      (for (rx <- 0 until 13; ry <- 0 until 13)
        yield new org.locationtech.jts.geom.Envelope(
          rx * 8.0, rx * 8.0 + 8.0, ry * 8.0, ry * 8.0 + 8.0)) ++
      (0 until 300).map { _ =>
        val x = rnd.nextDouble() * 100; val y = rnd.nextDouble() * 100
        val w = rnd.nextDouble() * 25; val h = rnd.nextDouble() * 25
        new org.locationtech.jts.geom.Envelope(x, x + w, y, y + h)
      }
    for (env <- probes; i <- zones.indices) {
      val want = prep(i).containsProperly(gf.toGeometry(env))
      val got = idx.coversRect(i, env)
      assert(got == want, s"zone $i env $env want=$want got=$got")
      checked += 1; if (want) covered += 1
    }
    assert(checked > 0 && covered > 50) // both outcomes exercised
  }

  test("candidates + locator agree with brute-force contains") {
    val grid = RasterGrid(GeoTransform(-180.0, 2.8125, 0.0, 90.0, 0.0,
      -1.40625), 128, 128, 16, 16)
    val zones = graft.engine.Fixtures.zonesBasic(grid).toArray
    val idx = new ZoneIndex(zones)
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    for (gr <- 0 until 128; gc <- 0 until 128 by 3) {
      val x = grid.gt.pixelCenterX(gc); val y = grid.gt.pixelCenterY(gr)
      val pt = gf.createPoint(new org.locationtech.jts.geom.Coordinate(x, y))
      val brute = zones.indices.filter(i => zones(i).geom.contains(pt)).toSet
      val c = new org.locationtech.jts.geom.Coordinate(x, y)
      val viaIdx = idx.candidates(new org.locationtech.jts.geom.Envelope(c))
        .filter(i => idx.locator(i).locate(c) ==
          org.locationtech.jts.geom.Location.INTERIOR).toSet
      assert(viaIdx === brute, s"at ($gr,$gc)")
    }
  }
}
