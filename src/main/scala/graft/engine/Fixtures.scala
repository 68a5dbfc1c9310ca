package graft.engine

import graft.geom.{RasterGrid, Zone}
import graft.synth.Synth
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

/** Deterministic zone fixtures over the 128×128 test grid
  * (FIXTURES.md §2) — every representative case the reference's
  * semantics branch on. Vertices sit on pixel boundaries so no pixel
  * center ever lies on a zone edge (GDAL tie-break avoidance).
  */
object Fixtures {
  private val gf = new GeometryFactory()

  /** L-shaped (concave) zone in pixel space: the union of
    * [c0,c1)×[r0,r1) top bar and [c0,cMid)×[r1,r2) stem. */
  def lshapePx(grid: RasterGrid, fid: Long, group: String, c0: Int, r0: Int,
      c1: Int, r1: Int, cMid: Int, r2: Int): Zone = {
    def pt(c: Int, r: Int) =
      new Coordinate(grid.gt.cornerX(c), grid.gt.cornerY(r))
    val ring = Array(pt(c0, r0), pt(c1, r0), pt(c1, r1), pt(cMid, r1),
      pt(cMid, r2), pt(c0, r2), pt(c0, r0))
    Zone(fid, group, gf.createPolygon(ring))
  }

  /** Multipolygon of two pixel-space rects (sliver parts for the
    * fallback's last-part-wins quirk). */
  def multiPx(grid: RasterGrid, fid: Long, group: String,
      parts: Seq[(Double, Double, Double, Double)]): Zone = {
    val polys = parts.map { case (c0, r0, c1, r1) =>
      val x0 = grid.gt.x0 + c0 * grid.gt.px
      val x1 = grid.gt.x0 + c1 * grid.gt.px
      val y0 = grid.gt.y0 + r0 * grid.gt.py
      val y1 = grid.gt.y0 + r1 * grid.gt.py
      gf.createPolygon(Array(
        new Coordinate(math.min(x0, x1), math.min(y0, y1)),
        new Coordinate(math.max(x0, x1), math.min(y0, y1)),
        new Coordinate(math.max(x0, x1), math.max(y0, y1)),
        new Coordinate(math.min(x0, x1), math.max(y0, y1)),
        new Coordinate(math.min(x0, x1), math.min(y0, y1))))
    }
    Zone(fid, group, gf.createMultiPolygon(polys.toArray))
  }

  /** The standard zone set: disjoint same-group rects (rollup),
    * overlapping different-group rects (pair-join), numeric-string
    * groups ("2" vs "10" lexicographic sort), null group, a zone
    * fully outside the raster, an all-nodata zone, and a concave
    * L-shape (PIP beyond bbox). */
  def zonesBasic(grid: RasterGrid): Seq[Zone] = Seq(
    Synth.rectPx(grid, 1, "alpha", 2, 2, 20, 12),
    Synth.rectPx(grid, 2, "alpha", 40, 30, 60, 44),
    Synth.rectPx(grid, 3, "beta", 10, 8, 30, 26),
    Synth.rectPx(grid, 4, "2", 70, 70, 100, 100),
    Synth.rectPx(grid, 5, "10", 0, 100, 30, 120),
    Synth.rectPx(grid, 6, null, 100, 10, 120, 40),
    Zone.rect(7, "outside", 200.0, 10.0, 210.0, 20.0),
    Synth.rectPx(grid, 8, "ndonly", 121, 121, 127, 127),
    lshapePx(grid, 9, "lshape", 80, 8, 96, 16, 88, 32))

  /** DuckDB predicate for membership of pixel (gr, gc) in each basic
    * zone, keyed by fid — mirrors [[zonesBasic]] exactly. */
  val zonesBasicSqlMembership: Seq[(Long, String, String)] = Seq(
    (1L, "alpha", "gc >= 2 AND gc < 20 AND gr >= 2 AND gr < 12"),
    (2L, "alpha", "gc >= 40 AND gc < 60 AND gr >= 30 AND gr < 44"),
    (3L, "beta", "gc >= 10 AND gc < 30 AND gr >= 8 AND gr < 26"),
    (4L, "2", "gc >= 70 AND gc < 100 AND gr >= 70 AND gr < 100"),
    (5L, "10", "gc >= 0 AND gc < 30 AND gr >= 100 AND gr < 120"),
    (6L, null, "gc >= 100 AND gc < 120 AND gr >= 10 AND gr < 40"),
    (8L, "ndonly", "gc >= 121 AND gc < 127 AND gr >= 121 AND gr < 127"),
    (9L, "lshape", "(gc >= 80 AND gc < 96 AND gr >= 8 AND gr < 16) OR " +
      "(gc >= 80 AND gc < 88 AND gr >= 16 AND gr < 32)"))

  /** [[zonesBasic]] with the "outside" zone addressed in PIXEL space
    * (cols 200.. of a 128-col grid) instead of hardcoded geographic
    * coords — valid for ANY grid geo-referencing, so the same
    * membership SQL covers reprojected (non-degree) grids too. */
  def zonesReproj(grid: RasterGrid): Seq[Zone] = zonesBasic(grid).map {
    case z if z.fid == 7L =>
      Synth.rectPx(grid, 7, "outside", 200, 10, 210, 20)
    case z => z
  }

  /** All group labels of [[zonesBasic]] (incl. pixel-less ones) for
    * the zero-fill left join. */
  val basicGroupsSql: String =
    "(VALUES ('alpha'),('beta'),('2'),('10'),(CAST(NULL AS VARCHAR))," +
      "('outside'),('ndonly'),('lshape'))"

  /** Rect whose edges pass EXACTLY through the centers of cols c0/c1
    * and rows r0/r1 — every perimeter pixel center is a boundary tie,
    * decided by the raster top-left rule (top/left edge centers
    * belong, bottom/right do not). Membership: gc ∈ [c0, c1),
    * gr ∈ [r0, r1). */
  def centerRectPx(grid: RasterGrid, fid: Long, group: String, c0: Int,
      r0: Int, c1: Int, r1: Int): Zone = {
    def pt(c: Int, r: Int) =
      new Coordinate(grid.gt.pixelCenterX(c), grid.gt.pixelCenterY(r))
    Zone(fid, group, gf.createPolygon(Array(
      pt(c0, r0), pt(c1, r0), pt(c1, r1), pt(c0, r1), pt(c0, r0))))
  }

  /** Boundary-tie fixture set (GDAL `ALL_TOUCHED=FALSE` tie-break,
    * SURVEY.md §4 quirk 1 — grid-aligned admin boundaries hit these
    * constantly): a center-aligned rect, a right triangle whose 45°
    * hypotenuse passes exactly through pixel centers, and a degenerate
    * 1-pixel center rect. */
  def zonesTies(grid: RasterGrid): Seq[Zone] = {
    def pt(c: Int, r: Int) =
      new Coordinate(grid.gt.pixelCenterX(c), grid.gt.pixelCenterY(r))
    Seq(
      centerRectPx(grid, 1, "tl_rect", 10, 20, 40, 50),
      Zone(2, "tl_tri", gf.createPolygon(Array(
        pt(60, 60), pt(80, 60), pt(60, 80), pt(60, 60)))),
      centerRectPx(grid, 3, "tl_1px", 100, 100, 101, 101))
  }

  /** DuckDB membership for [[zonesTies]] under the top-left rule:
    * top/left tie centers in, bottom/right out — so the rect is the
    * half-open box, the triangle's hypotenuse (centers at
    * gc = 140 − gr) is excluded (it is the pixel-space RIGHT
    * crossing), and the 1-px rect keeps exactly its top-left pixel. */
  val zonesTiesSqlMembership: Seq[(Long, String, String)] = Seq(
    (1L, "tl_rect", "gc >= 10 AND gc < 40 AND gr >= 20 AND gr < 50"),
    (2L, "tl_tri", "gr >= 60 AND gr < 80 AND gc >= 60 AND gc < 140 - gr"),
    (3L, "tl_1px", "gc = 100 AND gr = 100"))

  /** Fallback fixtures: sub-pixel slivers that capture no pixel
    * center. s1 = single sliver inside pixel (row 10, col 5);
    * multi = two sliver parts → windows (50,20) then (90,77), the
    * LAST part's window supplies the scalars (runner.py:783-806). */
  def zonesFallback(grid: RasterGrid): Seq[Zone] = Seq(
    multiPx(grid, 1, "s1", Seq((5.3, 10.2, 5.45, 10.4))),
    // part 2 starts at 77.55 (NOT 77.5): a sliver edge exactly on the
    // pixel-center line would capture the center under the top-left
    // tie rule and bypass the fallback this fixture exists to test
    multiPx(grid, 2, "multi",
      Seq((20.2, 50.1, 20.3, 50.2), (77.55, 90.3, 77.9, 90.6))))
}
