package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / range join operators Spark lacks natively, built to
  * shuffle once and never explode the pair space.
  */
object Joins {

  /** Backward as-of join: for each left row, the LATEST right row with
    * the same `key` and `right.ts <= left.ts` (ties at equal ts
    * match). Left rows with no prior right row keep NULL payloads
    * (left-outer semantics).
    *
    * Implemented the shuffle-once way: tag the sides, UNION, and take
    * a running `last(payload, ignoreNulls)` over a (key)-partitioned
    * window ordered by (ts, side) — right rows sort before left rows
    * at equal ts, so equality matches. No range explosion, no per-key
    * driver loop; both sides shuffle exactly once on `key` and the
    * window is a single pass. At 100 TB this is the plan you want:
    * cost = sort within key partitions, skew bounded by key
    * cardinality like any window.
    *
    * `right` must be unique per (key, ts) — pre-aggregate if not
    * (this also pins tie semantics that engines otherwise leave
    * arbitrary).
    *
    * @param payload right columns carried onto matching left rows
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      ts: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // NULL join keys never match (SQL equality / DuckDB ASOF
    // semantics). Spark windows group NULL partition keys TOGETHER, so
    // NULL-key rows must not reach the window: NULL-key right rows are
    // dropped, NULL-key left rows bypass the join and come back with
    // NULL payloads (left-outer semantics preserved). When the schema
    // already proves a side's key non-nullable, skip its filter — the
    // left split would otherwise cost a second scan of the dominant
    // input for nothing.
    val leftNullable = left.schema(key).nullable
    val nullLeft =
      if (leftNullable) left.where(col(key).isNull) else left.limit(0)
    val left1 =
      if (leftNullable) left.where(col(key).isNotNull) else left
    val right1 =
      if (right.schema(key).nullable) right.where(col(key).isNotNull)
      else right
    // the payload travels as ONE struct so the matched right row is
    // atomic: a right row whose payload VALUES are NULL still matches
    // (its struct is non-NULL), and columns can never mix values from
    // different right rows — exactly ASOF semantics
    val rp = right1.withColumn("_p", struct(payload.map(col): _*))
    val l = left1
      .withColumn("_side", lit(1))
      .withColumn("_l", struct(leftCols.map(col): _*))
      .select(col(key), col(ts), col("_side"), col("_l"),
        lit(null).cast(rp.schema("_p").dataType).as("_p"))
    val r = rp
      .select(col(key), col(ts), lit(0).as("_side"),
        lit(null).cast(l.schema("_l").dataType).as("_l"), col("_p"))

    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .select(col("_side"), col("_l"),
        last(col("_p"), ignoreNulls = true).over(w).as("_p"))
    val joined = filled.where(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c")) ++
        payload.map(p => col(s"_p.$p").as(p)): _*)
    val rSchema = right.schema
    val nullOut = nullLeft.select(leftCols.map(col) ++
      payload.map(p => lit(null).cast(rSchema(p).dataType).as(p)): _*)
    joined.unionByName(nullOut)
  }

  /** Range join: points against (possibly overlapping) intervals,
    * emitting every (point, interval) pair with lo <= v <= hi.
    *
    * Bucketed equi-join: intervals explode into the fixed-width
    * buckets they span, points land in one bucket, the join runs on
    * the bucket key and an exact BETWEEN filters the candidates. With
    * bucketWidth >= the typical interval width the explode factor is
    * ~2, and the pair space never materializes — the scale-path
    * replacement for a theta join (which Spark plans as
    * BroadcastNestedLoopJoin). */
  def rangeJoin(points: DataFrame, vCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ints = intervals.withColumn("_b",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pts = points.withColumn("_b",
      floor(col(vCol) / bucketWidth).cast("long"))
    pts.join(ints, Seq("_b"))
      .where(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("_b")
  }
}
