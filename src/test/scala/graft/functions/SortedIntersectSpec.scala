package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SortedIntersectCount]] must equal `size(array_intersect(a, b))`
  * on every sorted-distinct input (the tokenHashSet contract) — this
  * pins the r8 verify-join swap to the expression it replaced. */
class SortedIntersectSpec extends SparkSpec {

  private def both(a: Seq[Long], b: Seq[Long]): (Long, Long) = {
    import spark.implicits._
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(
      functions.sorted_intersect_count(col("a"), col("b")).as("m"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("s"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("equals size(array_intersect) on random sorted-distinct arrays") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextLong() % 50)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextLong() % 50)
        .distinct.sorted
      val (m, s) = both(a, b)
      assert(m == s, s"a=$a b=$b")
    }
  }

  test("edges: empty, disjoint, identical, negative values") {
    assert(both(Nil, Nil) == ((0L, 0L)))
    assert(both(Seq(1L, 2L), Nil) == ((0L, 0L)))
    assert(both(Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L))._1 == 3L)
    assert(both(Seq(1L, 3L), Seq(2L, 4L))._1 == 0L)
    assert(both(Seq(Long.MinValue, Long.MaxValue),
      Seq(Long.MinValue, 0L, Long.MaxValue))._1 == 2L)
  }

  test("null input yields null (nullIntolerant)") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
    val r = df.select(
      functions.sorted_intersect_count(col("a"), col("b")).as("m"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("interpreted (non-codegen) eval path agrees") {
    val a = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(1L, 5L, 9L))
    val b = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(0L, 5L, 9L, 11L))
    assert(SortedIntersectCountImpl.compute(a, b) == 2L)
  }
}
