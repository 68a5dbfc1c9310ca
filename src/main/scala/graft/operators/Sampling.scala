package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling / split assignment for training corpora.
  *
  * Both operators key on a CONTENT-STABLE hash (md5 of the key
  * column), not RNG: the same row lands in the same split on every
  * run, machine and engine — the property a 100 TB train/val/test
  * carve needs so that resumed or incremental pipeline runs never
  * leak rows across splits. Pure column expressions: no shuffle, no
  * UDF, fully replicable in external SQL (the md5→decimal recipe is
  * shared with the MinHash operators).
  */
object Sampling {

  /** First 15 hex digits of md5(key) as a non-negative long —
    * uniform, content-stable. A NULL key fails LOUDLY: a split/sample
    * operator silently dropping or mis-routing null-key rows would
    * skew the carve and leak rows across splits once the keys are
    * backfilled. */
  def hashBucket(key: Column, buckets: Int): Column = {
    val k = coalesce(key.cast("string"),
      raise_error(lit("Sampling: NULL key — hash split/sample requires " +
        "a non-null key column")))
    pmod(conv(substring(md5(k), 1, 15), 16, 10).cast("long"), lit(buckets))
  }

  /** Assign each row a named split by integer weights, e.g.
    * `Seq("train" -> 8, "val" -> 1, "test" -> 1)` → 80/10/10.
    * Adds `split_name`; weights partition the hash space in the
    * order given. */
  def hashSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty positive weights")
    val total = splits.map(_._2).sum
    val b = hashBucket(col(keyCol), total)
    val cum = splits.scanLeft(0)(_ + _._2).tail
    // right-fold builds when(b<w1, s1).otherwise(when(b<w1+w2, s2)...)
    val chain = splits.zip(cum).reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (acc, ((name, _), upper)) =>
          when(b < upper, lit(name)).otherwise(acc)
      }
    df.withColumn("split_name", chain)
  }

  /** Deterministic subsample: keep rows whose hash bucket (out of
    * `denominator`) falls below `numerator` — an exact, repeatable
    * `numerator/denominator` fraction in expectation, stable under
    * re-runs and unions of incremental batches. */
  def sampleByHash(df: DataFrame, keyCol: String, numerator: Int,
      denominator: Int): DataFrame = {
    require(numerator >= 0 && numerator <= denominator && denominator > 0,
      s"invalid fraction $numerator/$denominator")
    df.where(hashBucket(col(keyCol), denominator) < numerator)
  }
}
