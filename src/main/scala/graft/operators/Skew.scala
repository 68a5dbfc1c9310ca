package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling: two-stage salted aggregation.
  *
  * A `groupBy(key).agg(...)` with one hot key concentrates that key's
  * rows on a single reducer. Salting splits each key into `buckets`
  * sub-keys for the first (partial) aggregation, so the hot key's
  * rows spread across `buckets` reducers, then a second exchange on
  * the bare key merges the partials — correct for any algebraic
  * aggregate. (The zonal engine itself does not need this: per-tile
  * partials + map-side combine absorb pixel skew before any exchange,
  * and its post-shuffle keys are dimension-sized. This operator is
  * the general-purpose tool for relational pipelines whose skew is in
  * the key distribution itself.)
  */
object Skew {

  /** Salted grouped sums: equivalent to
    * `df.groupBy(keys).agg(sum(v1), sum(v2), ...)` with the hot-key
    * row stream split `buckets` ways in stage one.
    *
    * @param saltFrom high-cardinality column whose hash spreads a
    *                 key's rows across buckets (deterministic — no
    *                 RNG, so re-runs and resumes agree)
    */
  def saltedSums(df: DataFrame, keys: Seq[String], sums: Seq[Column],
      sumNames: Seq[String], saltFrom: String, buckets: Int): DataFrame = {
    require(sums.nonEmpty, "saltedSums needs at least one aggregate")
    require(sums.length == sumNames.length,
      "sums and sumNames must align")
    require(buckets > 0, "buckets must be positive")
    // SUM-mergeable aggregates only: stage two re-sums the partials,
    // which is wrong for avg/min/count-distinct — compose those from
    // salted sums/counts instead
    val salted = df.withColumn("_salt",
      pmod(hash(col(saltFrom)), lit(buckets)))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sums.head.as(sumNames.head),
        sums.tail.zip(sumNames.tail).map { case (c, n) => c.as(n) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sumNames.head)).as(sumNames.head),
        sumNames.tail.map(n => sum(col(n)).as(n)): _*)
  }
}
