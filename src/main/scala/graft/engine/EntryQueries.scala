package graft.engine

import graft.operators.ZonalEngine
import graft.synth.Synth
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The driver-facing query registry: each entry is a Spark pipeline
  * over deterministic synthesized fixtures (spatial queries) or the
  * driver's parquet tables (generic operators), with a matching
  * DuckDB oracle in [[oracleSql]]. Column names/types are aligned
  * pairwise — the driver hash-compares values after sorting columns
  * by name.
  */
object EntryQueries {

  // ---------------------------------------------------------------
  // Zonal statistics over the synthesized tile table
  // ---------------------------------------------------------------

  /** Shared SQL prologue: the pixel grid + per-zone assignment, as
    * pure arithmetic over `range()` — self-contained in DuckDB. */
  private def zonalPrologue: String = {
    val membership = Fixtures.zonesBasicSqlMembership.map {
      case (fid, grp, cond) =>
        val g = if (grp == null) "CAST(NULL AS VARCHAR)" else s"'$grp'"
        s"SELECT $fid AS fid, $g AS grp, v FROM px WHERE $cond"
    }.mkString("\n  UNION ALL ")
    s"""WITH px AS (
  SELECT gr, gc, ${Synth.valueSql()} AS v
  FROM range(0,128) t_r(gr), range(0,128) t_c(gc)
),
asg AS (
  $membership
),
groups(grp) AS ${Fixtures.basicGroupsSql},
g AS (
  SELECT grp,
    CAST(count(*) AS BIGINT) AS cnt,
    CAST(count(*) FILTER (WHERE v = -9999.0) AS BIGINT) AS nd,
    sum(v) FILTER (WHERE v <> -9999.0) AS sv,
    sum(v*v) FILTER (WHERE v <> -9999.0) AS svv,
    min(v) FILTER (WHERE v <> -9999.0) AS mnv,
    max(v) FILTER (WHERE v <> -9999.0) AS mxv
  FROM asg GROUP BY grp
)"""
  }

  def zonalBasic(spark: SparkSession): DataFrame = {
    val grid = Synth.testGrid
    val tiles = Synth.tiles(spark, grid)
    val res = ZonalEngine.run(spark, tiles, Fixtures.zonesBasic(grid), grid,
      nodata = Some(-9999.0))
    res.select(
      col("group").as("grp"),
      col("count").as("cnt"),
      col("nodata_count").as("nodata_cnt"),
      col("valid_count").as("valid_cnt"),
      col("sum").as("sum_v"),
      col("min").as("min_v"),
      col("max").as("max_v"),
      when(col("valid_count") > 0, col("sum") / col("valid_count"))
        .as("mean_v"),
      col("stdev").as("stdev_v"))
  }

  val zonalBasicSql: String = s"""$zonalPrologue
SELECT groups.grp AS grp,
  COALESCE(g.cnt, 0) AS cnt,
  COALESCE(g.nd, 0) AS nodata_cnt,
  COALESCE(g.cnt - g.nd, 0) AS valid_cnt,
  COALESCE(g.sv, 0.0) AS sum_v,
  g.mnv AS min_v,
  g.mxv AS max_v,
  CASE WHEN g.cnt - g.nd > 0 THEN g.sv / (g.cnt - g.nd) END AS mean_v,
  CASE WHEN g.cnt - g.nd > 0 THEN
    sqrt(greatest(g.svv / (g.cnt - g.nd)
      - (g.sv / (g.cnt - g.nd)) * (g.sv / (g.cnt - g.nd)), 0.0))
  END AS stdev_v
FROM groups LEFT JOIN g ON groups.grp IS NOT DISTINCT FROM g.grp"""

  def zonalPercentile(spark: SparkSession): DataFrame = {
    val grid = Synth.testGrid
    val tiles = Synth.tiles(spark, grid)
    val res = ZonalEngine.run(spark, tiles, Fixtures.zonesBasic(grid), grid,
      nodata = Some(-9999.0), percentilesRaw = Seq(5.0, 95.0))
    res.select(
      col("group").as("grp"),
      col("valid_count").as("valid_cnt"),
      round(col("p5"), 6).as("p5"),
      round(col("p95"), 6).as("p95"))
  }

  val zonalPercentileSql: String = s"""$zonalPrologue
SELECT groups.grp AS grp,
  COALESCE(g.cnt - g.nd, 0) AS valid_cnt,
  round(q.q05, 6) AS p5,
  round(q.q95, 6) AS p95
FROM groups
LEFT JOIN g ON groups.grp IS NOT DISTINCT FROM g.grp
LEFT JOIN (
  SELECT grp,
    quantile_cont(v, 0.05) FILTER (WHERE v <> -9999.0) AS q05,
    quantile_cont(v, 0.95) FILTER (WHERE v <> -9999.0) AS q95
  FROM asg GROUP BY grp
) q ON groups.grp IS NOT DISTINCT FROM q.grp"""

  /** Envelope-fallback path: sub-pixel slivers; the multipart zone's
    * LAST part supplies scalars, percentile chunks accumulate over
    * all parts (runner.py:783-811). Windows (precomputed from the
    * fixture coordinates): s1→pixel (10,5); multi→(50,20) then
    * (90,77). */
  def zonalFallback(spark: SparkSession): DataFrame = {
    val grid = Synth.testGrid
    val tiles = Synth.tiles(spark, grid)
    val res = ZonalEngine.run(spark, tiles, Fixtures.zonesFallback(grid),
      grid, nodata = Some(-9999.0), percentilesRaw = Seq(50.0),
      simplify = false)
    res.select(
      col("group").as("grp"),
      col("count").as("cnt"),
      col("nodata_count").as("nodata_cnt"),
      col("valid_count").as("valid_cnt"),
      col("sum").as("sum_v"),
      col("min").as("min_v"),
      col("max").as("max_v"),
      col("stdev").as("stdev_v"),
      round(col("p50"), 6).as("p50"))
  }

  val zonalFallbackSql: String = s"""WITH cells(grp, gr, gc, is_scalar) AS (
  VALUES ('s1', 10, 5, 1), ('multi', 50, 20, 0), ('multi', 90, 77, 1)
),
cv AS (
  SELECT grp, is_scalar, ${Synth.valueSql()} AS v FROM cells
),
scal AS (
  SELECT grp,
    CAST(count(*) AS BIGINT) AS cnt,
    CAST(count(*) FILTER (WHERE v = -9999.0) AS BIGINT) AS nd,
    COALESCE(sum(v) FILTER (WHERE v <> -9999.0), 0.0) AS sv,
    COALESCE(sum(v*v) FILTER (WHERE v <> -9999.0), 0.0) AS svv,
    min(v) FILTER (WHERE v <> -9999.0) AS mnv,
    max(v) FILTER (WHERE v <> -9999.0) AS mxv
  FROM cv WHERE is_scalar = 1 GROUP BY grp
),
q AS (
  SELECT grp, quantile_cont(v, 0.5) FILTER (WHERE v <> -9999.0) AS q50
  FROM cv GROUP BY grp
)
SELECT scal.grp AS grp, scal.cnt AS cnt, scal.nd AS nodata_cnt,
  scal.cnt - scal.nd AS valid_cnt, scal.sv AS sum_v,
  scal.mnv AS min_v, scal.mxv AS max_v,
  CASE WHEN scal.cnt - scal.nd > 0 THEN
    sqrt(greatest(scal.svv / (scal.cnt - scal.nd)
      - (scal.sv / (scal.cnt - scal.nd)) * (scal.sv / (scal.cnt - scal.nd)),
      0.0))
  END AS stdev_v,
  round(q.q50, 6) AS p50
FROM scal JOIN q ON scal.grp = q.grp"""
}
