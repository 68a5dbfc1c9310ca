package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Pins `ZonalStats.groupStatsLocalFrame` (the r8 driver-side rollup
  * the incremental path uses when the fallback is provably empty)
  * against the Spark rollup (`groupStats` + the finishStats column
  * ordering) — values (bitwise doubles), schema (names, types,
  * nullability), and row order, on randomized FRACTIONAL inputs so
  * float fold-order differences cannot hide behind integer-exact
  * sums.
  */
class GroupStatsLocalSpec extends SparkSpec {

  private def sparkRollup(rows: Seq[ZonalStats.FidStatRow],
      zones: Seq[(Long, Option[String])])
      : (org.apache.spark.sql.types.StructType, Array[Row]) = {
    import spark.implicits._
    val df = ZonalStats.fidStatsFrame(spark, rows)
    val zonesDf = zones.toDF("fid", "group")
    val g = ZonalStats.groupStats(df, zonesDf, None)
    val ordered = g.select("group", ZonalEngine.statFields(Nil): _*)
    (ordered.schema, ordered.collect())
  }

  private def sortKey(r: Row): String =
    if (r.isNullAt(0)) "￿<null>" else r.getString(0)

  private def assertSame(tag: String,
      sparkOut: (org.apache.spark.sql.types.StructType, Array[Row]),
      local: org.apache.spark.sql.DataFrame): Unit = {
    assert(local.schema == sparkOut._1, s"$tag schema")
    val lr = local.collect()
    assert(lr.length == sparkOut._2.length, s"$tag row count")
    // row order: both paths emit zone-table first-seen group order
    lr.zip(sparkOut._2).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.length == b.length, s"$tag arity row $i")
      (0 until a.length).foreach { c =>
        val (x, y) = (a.get(c), b.get(c))
        (x, y) match {
          case (xd: java.lang.Double, yd: java.lang.Double) =>
            assert(java.lang.Double.doubleToLongBits(xd) ==
              java.lang.Double.doubleToLongBits(yd),
              s"$tag row $i col $c: $xd != $yd (bitwise)")
          case _ =>
            assert(x == y, s"$tag row $i col $c: $x != $y")
        }
      }
    }
  }

  test("randomized fractional inputs: local ≡ Spark rollup") {
    val rnd = new scala.util.Random(20260822L)
    for (iter <- 0 until 20) {
      val nZones = 1 + rnd.nextInt(12)
      val groups: Seq[Option[String]] = (0 until nZones).map { i =>
        if (rnd.nextInt(8) == 0) None
        else Some(s"g${rnd.nextInt(1 + nZones / 2)}")
      }
      val zones = (0 until nZones).map(i => (i.toLong + 1, groups(i)))
      // stats rows for a SUBSET of fids (zero-fill exercises the rest)
      val rows = zones.filter(_ => rnd.nextBoolean()).map { case (fid, _) =>
        val cnt = 1L + rnd.nextInt(1000)
        val nd = rnd.nextInt(cnt.toInt + 1).toLong
        val valid = cnt - nd
        if (valid == 0)
          // all-nodata sentinel shape (fidStats min/max of no rows)
          ZonalStats.FidStatRow(fid, cnt, nd, Double.PositiveInfinity,
            Double.NegativeInfinity, 0.0, 0.0)
        else {
          val mn = rnd.nextDouble() * 100 - 50
          val mx = mn + rnd.nextDouble() * 100
          ZonalStats.FidStatRow(fid, cnt, nd, mn, mx,
            rnd.nextDouble() * 1e6 - 5e5, rnd.nextDouble() * 1e7)
        }
      }
      val local = ZonalStats.groupStatsLocalFrame(spark, rows, zones)
      assertSame(s"iter $iter", sparkRollup(rows, zones), local)
    }
  }

  test("edge: empty stats, single null group, shared groups") {
    val zones = Seq((1L, Option("a")), (2L, None), (3L, Option("a")))
    val local0 = ZonalStats.groupStatsLocalFrame(spark, Nil, zones)
    assertSame("empty", sparkRollup(Nil, zones), local0)

    val rows = Seq(
      ZonalStats.FidStatRow(1L, 10, 2, -1.25, 7.5, 12.375, 99.0625),
      ZonalStats.FidStatRow(3L, 4, 4, Double.PositiveInfinity,
        Double.NegativeInfinity, 0.0, 0.0),
      ZonalStats.FidStatRow(2L, 6, 0, 0.5, 0.5, 3.0, 1.5))
    val local = ZonalStats.groupStatsLocalFrame(spark, rows, zones)
    assertSame("edge", sparkRollup(rows, zones), local)
  }
}
