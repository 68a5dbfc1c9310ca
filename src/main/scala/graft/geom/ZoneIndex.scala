package graft.geom

import org.locationtech.jts.algorithm.locate.IndexedPointInAreaLocator
import org.locationtech.jts.geom._
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader}
import org.locationtech.jts.simplify.DouglasPeuckerSimplifier

/** A zone feature: the projection the reference extracts from its
  * GPKG layer (`/root/reference/runner.py:391-401`) — integer FID,
  * grouping value (nullable), geometry. */
final case class Zone(fid: Long, group: String, geom: Geometry)
    extends Serializable

object Zone {
  private val gf = new GeometryFactory()
  def wktReader = new WKTReader(gf)

  def fromWkt(fid: Long, group: String, wkt: String): Zone =
    Zone(fid, group, wktReader.read(wkt))

  def rect(fid: Long, group: String, x0: Double, y0: Double, x1: Double,
      y1: Double): Zone = {
    val sh = gf.createPolygon(Array(
      new Coordinate(x0, y0), new Coordinate(x1, y0),
      new Coordinate(x1, y1), new Coordinate(x0, y1),
      new Coordinate(x0, y0)))
    Zone(fid, group, sh)
  }

  def toWkb(g: Geometry): Array[Byte] = new WKBWriter().write(g)
  def fromWkb(b: Array[Byte]): Geometry = new WKBReader(gf).read(b)

  /** Douglas-Peucker simplification at half-pixel tolerance — the
    * reference's `VectorTranslate simplifyTolerance = pixel_width*0.5`
    * (`runner.py:297-298,349-365`). Applied before the join, so it
    * changes which pixels match; parity requires the same step. */
  def simplifyHalfPixel(g: Geometry, pixelWidth: Double): Geometry =
    DouglasPeuckerSimplifier.simplify(g, math.abs(pixelWidth) * 0.5)
}

/** Broadcastable zone index: serializes the zone list; the STRtree and
  * prepared geometries are rebuilt lazily once per executor JVM
  * (JTS PreparedGeometry is not serializable). This is the Spark
  * replacement for the reference's rasterize join
  * (`runner.py:463-469,596-606`): candidate lookup by envelope, then
  * per-pixel-center containment refinement (= ALL_TOUCHED=FALSE).
  */
final class ZoneIndex(val zones: Array[Zone]) extends Serializable {

  @transient private var _tree: STRtree = _
  @transient private var _prepared: Array[PreparedGeometry] = _
  @transient private var _locators: Array[IndexedPointInAreaLocator] = _

  // Build once per JVM. Every access goes through this synchronized
  // gate: JTS PreparedGeometry / IndexedPointInAreaLocator build their
  // internal indexes lazily on first use and that first touch is not
  // thread-safe, so each structure is PRIMED here (inside the lock)
  // with a dummy query; afterwards the structures are effectively
  // immutable and safe for concurrent reads by executor threads.
  private def ensure(): Unit = synchronized {
    if (_tree == null) {
      val t = new STRtree()
      val prep = new Array[PreparedGeometry](zones.length)
      val locs = new Array[IndexedPointInAreaLocator](zones.length)
      val gf = new GeometryFactory()
      var i = 0
      while (i < zones.length) {
        val g = zones(i).geom
        t.insert(g.getEnvelopeInternal, Integer.valueOf(i))
        prep(i) = PreparedGeometryFactory.prepare(g)
        locs(i) = new IndexedPointInAreaLocator(g)
        val c = g.getEnvelopeInternal.centre()
        locs(i).locate(c) // prime locator index
        prep(i).containsProperly(gf.createPoint(c)) // prime prepared index
        i += 1
      }
      t.build()
      _tree = t
      _prepared = prep
      _locators = locs
    }
  }

  def size: Int = zones.length

  /** Indices of zones whose envelope intersects `env`, ascending (so
    * downstream iteration order is deterministic). */
  def candidates(env: Envelope): Array[Int] = {
    ensure()
    val raw = _tree.query(env)
    val out = new Array[Int](raw.size())
    var i = 0
    while (i < out.length) {
      out(i) = raw.get(i).asInstanceOf[Integer].intValue(); i += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  def prepared(i: Int): PreparedGeometry = { ensure(); _prepared(i) }

  /** Point-in-area locator for per-pixel-center containment tests. */
  def locator(i: Int): IndexedPointInAreaLocator = { ensure(); _locators(i) }

  /** Total envelope of all zones (the vector extent of
    * `runner.py:417-422`), used for the bbox short-circuit. */
  lazy val totalEnvelope: Envelope = {
    val e = new Envelope()
    zones.foreach(z => e.expandToInclude(z.geom.getEnvelopeInternal))
    e
  }
}
