package graft.geom

import org.locationtech.jts.geom.{CoordinateSequence, Geometry}
import org.locationtech.jts.geom.CoordinateSequenceFilter

/** Minimal coordinate reference system support — the engine's P7
  * (`/root/reference/runner.py:307-341`): the reference reprojects the
  * aggregate vector into the raster SRS whenever the two differ, or
  * force-assigns the raster SRS when the vector SRS is missing, with
  * axis order pinned to traditional GIS (lon, lat).
  *
  * No projection library ships with Spark, so the supported systems
  * are implemented from their published formulas:
  *   - EPSG:4326  — WGS84 geographic, traditional (lon, lat) axis order
  *   - EPSG:3857  — spherical ("Web") Mercator, R = 6378137
  *   - EPSG:326zz / 327zz — WGS84 / UTM zone zz north / south, via the
  *     Krüger series in Karney, "Transverse Mercator with an accuracy
  *     of a few nanometers" (J. Geodesy 85, 2011) truncated at n^6
  *     (sub-micrometer over a zone)
  *
  * All transforms route through geographic (lon, lat) as the pivot.
  */
sealed trait Crs extends Serializable {
  def id: String
  /** projected/native (x, y) → (lon, lat) degrees */
  def toLonLat(x: Double, y: Double): (Double, Double)
  /** (lon, lat) degrees → projected/native (x, y) */
  def fromLonLat(lon: Double, lat: Double): (Double, Double)
}

object Crs {
  case object LonLat extends Crs {
    val id = "EPSG:4326"
    def toLonLat(x: Double, y: Double): (Double, Double) = (x, y)
    def fromLonLat(lon: Double, lat: Double): (Double, Double) = (lon, lat)
  }

  /** Spherical Mercator (EPSG:3857): x = R·λ, y = R·ln tan(π/4 + φ/2). */
  case object WebMercator extends Crs {
    val id = "EPSG:3857"
    private val R = 6378137.0
    def toLonLat(x: Double, y: Double): (Double, Double) =
      (math.toDegrees(x / R),
        math.toDegrees(2.0 * math.atan(math.exp(y / R)) - math.Pi / 2.0))
    def fromLonLat(lon: Double, lat: Double): (Double, Double) =
      (R * math.toRadians(lon),
        R * math.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0)))
  }

  /** WGS84 / UTM zone (Karney 2011 Krüger series, order n^6). */
  final case class Utm(zone: Int, north: Boolean) extends Crs {
    require(zone >= 1 && zone <= 60, s"bad UTM zone $zone")
    val id: String = s"EPSG:${if (north) 326 else 327}${f"$zone%02d"}"
    private val lon0 = zone * 6.0 - 183.0
    private val k0 = 0.9996
    private val FE = 500000.0
    private val FN = if (north) 0.0 else 10000000.0

    import Tm._

    def fromLonLat(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon - lon0)
      val sphi = math.sin(phi)
      // conformal latitude via Karney's tau' (exact, no series)
      val t = math.sinh(atanh(sphi) - e * atanh(e * sphi))
      val xip = math.atan2(t, math.cos(lam))
      // Karney eq. 8: η' = asinh(sin λ / sqrt(τ'² + cos²λ))
      val etp = asinh(math.sin(lam) / math.hypot(t, math.cos(lam)))
      var xi = xip
      var eta = etp
      var j = 1
      while (j <= 6) {
        xi += alpha(j - 1) * math.sin(2 * j * xip) * math.cosh(2 * j * etp)
        eta += alpha(j - 1) * math.cos(2 * j * xip) * math.sinh(2 * j * etp)
        j += 1
      }
      (FE + k0 * A * eta, FN + k0 * A * xi)
    }

    def toLonLat(x: Double, y: Double): (Double, Double) = {
      val xi0 = (y - FN) / (k0 * A)
      val eta0 = (x - FE) / (k0 * A)
      var xip = xi0
      var etp = eta0
      var j = 1
      while (j <= 6) {
        xip -= beta(j - 1) * math.sin(2 * j * xi0) * math.cosh(2 * j * eta0)
        etp -= beta(j - 1) * math.cos(2 * j * xi0) * math.sinh(2 * j * eta0)
        j += 1
      }
      val lam = math.atan2(math.sinh(etp), math.cos(xip))
      // tau' → tau (geographic latitude) by Newton iteration on
      // tau' = tau·sqrt(1+sigma²) − sigma·sqrt(1+tau²),
      // sigma = sinh(e·atanh(e·tau/sqrt(1+tau²)))  (Karney eq. 19-21)
      val taup = math.sin(xip) / math.hypot(math.sinh(etp), math.cos(xip))
      var tau = taup / math.sqrt(1.0 - e * e) // first guess
      var i = 0
      while (i < 7) {
        val sig = math.sinh(e * atanh(e * tau / math.hypot(1.0, tau)))
        val taupi = tau * math.hypot(1.0, sig) - sig * math.hypot(1.0, tau)
        val dtau = (taup - taupi) * (1.0 + (1.0 - e * e) * tau * tau) /
          ((1.0 - e * e) * math.hypot(1.0, taupi) * math.hypot(1.0, tau))
        tau += dtau
        i += 1
      }
      (lon0 + math.toDegrees(lam), math.toDegrees(math.atan(tau)))
    }
  }

  /** WGS84 transverse-Mercator constants (shared by all UTM zones). */
  private object Tm {
    val a = 6378137.0
    val f = 1.0 / 298.257223563
    val n = f / (2.0 - f)
    val e = math.sqrt(f * (2.0 - f))
    private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
    private val n5 = n4 * n; private val n6 = n5 * n
    val A = a / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0 + n6 / 256.0)
    // Krüger α/β coefficients to n^6 (Karney 2011, eqs. 35-36)
    val alpha: Array[Double] = Array(
      n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0
        - 127.0 * n5 / 288.0 + 7891.0 * n6 / 37800.0,
      13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0
        + 281.0 * n5 / 630.0 - 1983433.0 * n6 / 1935360.0,
      61.0 * n3 / 240.0 - 103.0 * n4 / 140.0 + 15061.0 * n5 / 26880.0
        + 167603.0 * n6 / 181440.0,
      49561.0 * n4 / 161280.0 - 179.0 * n5 / 168.0
        + 6601661.0 * n6 / 7257600.0,
      34729.0 * n5 / 80640.0 - 3418889.0 * n6 / 1995840.0,
      212378941.0 * n6 / 319334400.0)
    val beta: Array[Double] = Array(
      n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0
        - 81.0 * n5 / 512.0 + 96199.0 * n6 / 604800.0,
      n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0 + 46.0 * n5 / 105.0
        - 1118711.0 * n6 / 3870720.0,
      17.0 * n3 / 480.0 - 37.0 * n4 / 840.0 - 209.0 * n5 / 4480.0
        + 5569.0 * n6 / 90720.0,
      4397.0 * n4 / 161280.0 - 11.0 * n5 / 504.0
        - 830251.0 * n6 / 7257600.0,
      4583.0 * n5 / 161280.0 - 108847.0 * n6 / 3991680.0,
      20648693.0 * n6 / 638668800.0)
    def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
    def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1.0))
  }
  /** Parse an SRS tag. Unknown tags raise — the engine refuses to
    * guess a datum (the reference would similarly fail in OSR). */
  def parse(tag: String): Crs = {
    val t = tag.trim.toUpperCase
    t match {
      case "EPSG:4326" | "WGS84" => LonLat
      case "EPSG:3857" | "EPSG:900913" => WebMercator
      case s if s.startsWith("EPSG:326") && s.length == 10 =>
        Utm(s.substring(8).toInt, north = true)
      case s if s.startsWith("EPSG:327") && s.length == 10 =>
        Utm(s.substring(8).toInt, north = false)
      case other =>
        throw new IllegalArgumentException(s"unsupported SRS tag: $other")
    }
  }

  def same(aTag: String, bTag: String): Boolean =
    parse(aTag).id == parse(bTag).id

  /** Reproject a JTS geometry `src` → `dst` (copy; source untouched).
    * Mirrors `gdal.VectorTranslate(dstSRS=...)`: pure coordinate
    * transform, traditional (x=lon, y=lat) axis order on both ends. */
  def transformGeom(g: Geometry, src: Crs, dst: Crs): Geometry = {
    if (src.id == dst.id) return g.copy()
    val out = g.copy()
    out.apply(new CoordinateSequenceFilter {
      override def filter(seq: CoordinateSequence, i: Int): Unit = {
        val (lon, lat) = src.toLonLat(seq.getX(i), seq.getY(i))
        val (x, y) = dst.fromLonLat(lon, lat)
        seq.setOrdinate(i, 0, x)
        seq.setOrdinate(i, 1, y)
      }
      override def isDone: Boolean = false
      override def isGeometryChanged: Boolean = true
    })
    out.geometryChanged()
    out
  }

  /** The reference's reprojection decision (`runner.py:331-341`):
    * vector SRS missing → "forced reprojection", which in GDAL's
    * VectorTranslate without a source SRS just ASSIGNS the target SRS
    * (coordinates pass through); SRS equal → no-op; SRS differing →
    * coordinate transform. Raster SRS missing → zones taken as-is. */
  def projectZones(zones: Seq[Zone], vectorSrs: Option[String],
      rasterSrs: Option[String]): Seq[Zone] = {
    rasterSrs match {
      case None => zones
      case Some(rs) =>
        vectorSrs match {
          case None => zones // assign-only: coordinates unchanged
          case Some(vs) if same(vs, rs) => zones
          case Some(vs) =>
            val src = parse(vs); val dst = parse(rs)
            zones.map(z => z.copy(geom = transformGeom(z.geom, src, dst)))
        }
    }
  }
}
