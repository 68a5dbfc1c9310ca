package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class CrsSpec extends AnyFunSuite {

  test("web mercator: known anchors and inverse roundtrip") {
    val m = Crs.WebMercator
    val (ox, oy) = m.fromLonLat(0.0, 0.0)
    assert(ox === 0.0 && math.abs(oy) < 1e-8) // tan(π/4) ulp noise
    val (x180, _) = m.fromLonLat(180.0, 0.0)
    assert(math.abs(x180 - 20037508.342789244) < 1e-6)
    for (lon <- Seq(-179.9, -45.0, 0.1, 33.3, 179.9);
         lat <- Seq(-85.0, -12.5, 0.0, 47.9, 85.0)) {
      val (x, y) = m.fromLonLat(lon, lat)
      val (lo, la) = m.toLonLat(x, y)
      assert(math.abs(lo - lon) < 1e-9, s"lon $lon")
      assert(math.abs(la - lat) < 1e-9, s"lat $lat")
    }
  }

  test("UTM: central-meridian identities, hemisphere offsets, roundtrip") {
    // a point ON the central meridian at the equator maps to
    // (FE, FN) = (500000, 0 north / 10000000 south) exactly
    val z31n = Crs.Utm(31, north = true)
    val (e0, n0) = z31n.fromLonLat(3.0, 0.0)
    assert(math.abs(e0 - 500000.0) < 1e-6)
    assert(math.abs(n0) < 1e-6)
    val z33s = Crs.Utm(33, north = false)
    val (_, ns) = z33s.fromLonLat(15.0, 0.0)
    assert(math.abs(ns - 10000000.0) < 1e-6)
    // meridian arc: 45°N on the CM ≈ 4984944.378 m (WGS84 meridian
    // distance 4985596.4 m × k0=0.9996 — public geodesy constant)
    val (_, n45) = z31n.fromLonLat(3.0, 45.0)
    assert(math.abs(n45 - 0.9996 * 4984944.377977) < 0.5)
    // roundtrip accuracy within the zone (±3° of CM, wide lat range)
    for (dlon <- Seq(-2.9, -1.0, 0.0, 1.3, 2.9);
         lat <- Seq(-79.0, -30.0, -0.1, 0.0, 23.45, 60.0, 84.0)) {
      val utm = if (lat >= 0) z31n else Crs.Utm(31, north = false)
      val (x, y) = utm.fromLonLat(3.0 + dlon, lat)
      val (lo, la) = utm.toLonLat(x, y)
      assert(math.abs(lo - (3.0 + dlon)) < 1e-9, s"lon $dlon/$lat")
      assert(math.abs(la - lat) < 1e-9, s"lat $dlon/$lat")
    }
  }

  test("parse: tags, case, unknown rejected") {
    assert(Crs.parse("EPSG:4326") === Crs.LonLat)
    assert(Crs.parse("epsg:3857") === Crs.WebMercator)
    assert(Crs.parse("EPSG:32631") === Crs.Utm(31, north = true))
    assert(Crs.parse("EPSG:32733") === Crs.Utm(33, north = false))
    intercept[IllegalArgumentException](Crs.parse("EPSG:27700"))
  }

  test("projectZones: the reference decision table (runner.py:331-341)") {
    val z = Seq(Zone.rect(1, "g", 10.0, 20.0, 11.0, 21.0))
    def x0(zs: Seq[Zone]) = zs.head.geom.getEnvelopeInternal.getMinX
    // raster SRS missing → as-is
    assert(x0(Crs.projectZones(z, Some("EPSG:4326"), None)) === 10.0)
    // vector SRS missing → SRS assigned, coordinates unchanged
    assert(x0(Crs.projectZones(z, None, Some("EPSG:3857"))) === 10.0)
    // same SRS → unchanged
    assert(x0(Crs.projectZones(z, Some("WGS84"), Some("EPSG:4326"))) === 10.0)
    // differing SRS → transformed
    val p = Crs.projectZones(z, Some("EPSG:4326"), Some("EPSG:3857"))
    assert(math.abs(x0(p) - Crs.WebMercator.fromLonLat(10.0, 20.0)._1)
      < 1e-9)
    // source zones untouched (transform is a copy)
    assert(x0(z) === 10.0)
  }

  test("transformGeom preserves structure on polygons with holes") {
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    def ring(pts: (Double, Double)*) = gf.createLinearRing(
      pts.map(p => new org.locationtech.jts.geom.Coordinate(p._1, p._2))
        .toArray)
    val poly = gf.createPolygon(
      ring((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)),
      Array(ring((4, 4), (6, 4), (6, 6), (4, 6), (4, 4))))
    val out = Crs.transformGeom(poly, Crs.LonLat, Crs.WebMercator)
    val back = Crs.transformGeom(out, Crs.WebMercator, Crs.LonLat)
    assert(out.isValid)
    assert(back.getNumGeometries === 1)
    assert(back.norm().equalsExact(poly.norm(), 1e-9))
  }
}
