package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def ts(min: Int) = new java.sql.Timestamp(
    java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime + min * 60000L)

  test("asofBackward: latest prior match, equal-ts matches, no-match null") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", ts(10), 100.0),
      (2L, "a", ts(20), 200.0),
      (3L, "a", ts(5), 300.0), // before any right row for key a
      (4L, "b", ts(15), 400.0),
      (5L, "c", ts(15), 500.0)) // key with no right rows at all
      .toDF("id", "k", "ts", "v")
    val right = Seq(
      ("a", ts(10), 11.0), // equal ts as left id=1 → matches
      ("a", ts(18), 12.0),
      ("b", ts(1), 21.0),
      ("b", ts(14), 22.0))
      .toDF("k", "ts", "rv")
      .withColumn("r_ts", col("ts"))
    val out = Joins.asofBackward(left, right, "k", "ts",
      Seq("r_ts", "rv"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getAs[java.sql.Timestamp]("r_ts")),
          Option(r.getAs[Any]("rv")))).toMap
    assert(out(1L) === ((Some(ts(10)), Some(11.0)))) // ties match
    assert(out(2L) === ((Some(ts(18)), Some(12.0)))) // latest prior
    assert(out(3L) === ((None, None))) // nothing prior
    assert(out(4L) === ((Some(ts(14)), Some(22.0))))
    assert(out(5L) === ((None, None))) // unmatched key
    assert(out.size === 5) // exactly one output row per left row
  }

  test("asofBackward: NULL payload in the LATEST right row is kept") {
    import spark.implicits._
    // the latest prior right row has rv = NULL: ASOF semantics return
    // THAT row's NULL, not an older row's value backfilled over it
    val left = Seq((1L, "a", ts(30), 1.0)).toDF("id", "k", "ts", "v")
    val right = Seq(
      ("a", ts(10), Some(5.0)),
      ("a", ts(20), None: Option[Double]))
      .toDF("k", "ts", "rv")
      .withColumn("r_ts", col("ts"))
    val row = Joins.asofBackward(left, right, "k", "ts",
      Seq("r_ts", "rv")).collect().head
    assert(row.getAs[java.sql.Timestamp]("r_ts") === ts(20))
    assert(row.isNullAt(row.fieldIndex("rv")),
      "older rv backfilled over the matched row's NULL")
  }

  test("rangeJoin equals the theta join, incl. intervals spanning buckets") {
    import spark.implicits._
    val pts = (0 until 300).map(i => (i.toLong, i * 0.7)).toDF("pid", "v")
    // overlapping intervals, some wider than the bucket
    val ints = Seq(
      (1L, 5.0, 12.0), (2L, 10.0, 11.0), (3L, 0.0, 99.0), // wide
      (4L, 150.0, 163.0), (5L, 208.9, 209.1), (6L, -10.0, -1.0))
      .toDF("iid", "lo", "hi")
    val got = Joins.rangeJoin(pts, "v", ints, "lo", "hi",
        bucketWidth = 10.0)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = pts.join(ints, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exp)
    assert(exp.nonEmpty)
  }
}
