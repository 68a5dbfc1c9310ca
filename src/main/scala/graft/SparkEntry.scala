package graft
import graft.engine.EntryQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator registers a query + (where ANSI-SQL
  * expressible) a DuckDB oracle; spatial queries run over
  * deterministic synthesized fixtures, generic operators over the
  * driver's parquet tables in `sfDir`.
  */
object SparkEntry {
  /** Flagship: full zonal-statistics pipeline (decode → spatial join
    * → rollup) over the synthesized world tile table. */
  def entry(spark: SparkSession): DataFrame =
    EntryQueries.zonalBasic(spark)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zonal_basic" -> ((s, _) => EntryQueries.zonalBasic(s)),
    "q_zonal_percentile" -> ((s, _) => EntryQueries.zonalPercentile(s)),
    "q_zonal_fallback" -> ((s, _) => EntryQueries.zonalFallback(s)),
  )

  def oracleSql: Map[String, String] = Map(
    "q_zonal_basic" -> EntryQueries.zonalBasicSql,
    "q_zonal_percentile" -> EntryQueries.zonalPercentileSql,
    "q_zonal_fallback" -> EntryQueries.zonalFallbackSql,
  )
}
