package graft.engine

import graft.functions.{functions => gf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic relational operators exercised over the driver's parquet
  * tables, each with a value-exact DuckDB oracle. Money columns are
  * summed as DECIMAL (order-independent, engine-independent) and cast
  * to double at the end; doubles are only ever produced by identical
  * arithmetic on both sides.
  */
object GenericQueries {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // ---- A1/A2-style grouped aggregation (TPC-H Q1 shape) ----
  def aggPricing(spark: SparkSession, sf: String): DataFrame = {
    val li = t(spark, sf, "lineitem")
    li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
        .as("sum_qty"),
      sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
        .as("sum_base"),
      sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
          col("l_discount").cast("decimal(18,2)"))).cast("double")
        .as("sum_disc"),
      count(lit(1)).as("cnt"))
      .withColumn("avg_qty", col("sum_qty") / col("cnt"))
  }

  /** HLL++ approximate distinct (`approx_count_distinct`) — the
    * mergeable map-side scale path next to the exact
    * `countDistinct` (A7): register maxima merge commutatively, so
    * the estimate is partitioning-independent and deterministic for
    * a given dataset, but its VALUE is engine-specific — pinned via
    * the bounds-check oracle pattern (like the GK percentile query):
    * the exact counts hash-compare, the estimate asserts its rsd
    * envelope in-query, and DuckDB asserts `true`. */
  def approxDistinct(spark: SparkSession, sf: String): DataFrame = {
    val li = t(spark, sf, "lineitem")
    li.groupBy("l_returnflag").agg(
      countDistinct("l_partkey").as("n_exact"),
      approx_count_distinct(col("l_partkey"), 0.05).as("appx"))
      .select(col("l_returnflag"), col("n_exact"),
        (abs(col("appx") - col("n_exact")).cast("double") <=
          col("n_exact").cast("double") * 0.15).as("within_bounds"))
  }

  val approxDistinctSql: String = """
SELECT l_returnflag,
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
  true AS within_bounds
FROM lineitem GROUP BY 1"""

  val aggPricingSql: String = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
    AS DOUBLE) AS sum_disc,
  CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    AS avg_qty
FROM lineitem GROUP BY 1, 2"""

  // ---- J-style joins: broadcast dim chain ----
  def joinNationRevenue(spark: SparkSession, sf: String): DataFrame = {
    val o = t(spark, sf, "orders")
    val c = t(spark, sf, "customer")
    val n = t(spark, sf, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name").agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
  }

  val joinNationRevenueSql: String = """
SELECT n_name,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1"""

  // ---- anti join (J4 analogue: unmatched keys) ----
  def antiCustomersNoOrders(spark: SparkSession, sf: String): DataFrame = {
    val c = t(spark, sf, "customer")
    val o = t(spark, sf, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
  }

  val antiCustomersNoOrdersSql: String = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer WHERE NOT EXISTS
  (SELECT 1 FROM orders WHERE o_custkey = c_custkey
   AND o_orderpriority = '1-URGENT')
GROUP BY 1"""

  // ---- semi join ----
  def semiCustomersWithOrders(spark: SparkSession, sf: String): DataFrame = {
    val c = t(spark, sf, "customer")
    val o = t(spark, sf, "orders")
    val n = t(spark, sf, "nation")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_customers"))
  }

  val semiCustomersWithOrdersSql: String = """
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1"""

  // ---- set ops: union + distinct (T2/A7) ----
  def distinctUnion(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "events").select(col("event_type").as("v"))
    val o = t(spark, sf, "orders").select(col("o_orderpriority").as("v"))
    e.union(o).distinct()
  }

  val distinctUnionSql: String = """
SELECT DISTINCT v FROM (
  SELECT event_type AS v FROM events
  UNION ALL SELECT o_orderpriority AS v FROM orders)"""

  // ---- O1 ordering: lexicographic with NULL last (runner.py:981-983)
  def sortNullLast(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val df = Seq(Some("10"), Some("2"), None, Some("apple"), Some("Banana"),
      Some(""), Some("02"), Some("10a")).toDF("v")
    df.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(
        col("v").isNull.asc, col("v").asc)))
  }

  val sortNullLastSql: String = """
SELECT v, CAST(row_number() OVER (ORDER BY (v IS NULL), v) AS INT) AS rn
FROM (VALUES ('10'), ('2'), (NULL), ('apple'), ('Banana'), (''), ('02'),
  ('10a')) t(v)"""

  // ---- R1-style pivot (wide reshape) ----
  val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def pivotEvents(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "events")
      .withColumn("u", col("user_id") % 5)
    e.groupBy("u").pivot("event_type", eventTypes)
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double"))
  }

  val pivotEventsSql: String = {
    val cols = eventTypes.map(et =>
      s"""CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = '$et') AS DOUBLE) AS "$et"""")
      .mkString(",\n  ")
    s"""
SELECT user_id % 5 AS u,
  $cols
FROM events GROUP BY 1"""
  }

  // ---- event-time bucketing (batch analogue of windowed agg) ----
  def hourlyEvents(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "events")
    e.groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_v"))
  }

  val hourlyEventsSql: String = """
SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v
FROM events GROUP BY 1"""

  // ---- exact percentiles on a generic table (A4 analogue) ----
  def percentileQuantity(spark: SparkSession, sf: String): DataFrame = {
    val li = t(spark, sf, "lineitem")
    li.groupBy("l_returnflag").agg(
      round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
      round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
      round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"))
  }

  val percentileQuantitySql: String = """
SELECT l_returnflag,
  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
  round(quantile_cont(l_quantity, 0.75), 6) AS p75
FROM lineitem GROUP BY 1"""

  // ---- the IsCloseTo Catalyst expression on a generic column (P3) ----
  def iscloseDiscount(spark: SparkSession, sf: String): DataFrame = {
    val li = t(spark, sf, "lineitem")
    li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n_rows"),
      count(when(gf.is_close(col("l_discount"), lit(0.05)), 1))
        .as("n_close"))
  }

  val iscloseDiscountSql: String = """
SELECT l_returnflag,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(*) FILTER (WHERE abs(l_discount - 0.05) <= 1e-8 + 1e-5 * abs(0.05))
    AS BIGINT) AS n_close
FROM lineitem GROUP BY 1"""

  // ---- Morton cell encoding of generic points (CellId expression) ----
  def cellPoints(spark: SparkSession, sf: String): DataFrame = {
    val c = t(spark, sf, "customer")
    val lon = (col("c_custkey") % 360).cast("double") - 180.0 + 0.5
    val lat = ((col("c_custkey") * 7) % 180).cast("double") - 90.0 + 0.5
    c.select(col("c_custkey"),
      gf.cell_id(lon, lat, lit(8)).as("cell"))
  }

  val cellPointsSql: String = {
    def spread(x: String, shift: Int): String =
      (0 until 8).map(k =>
        s"((($x >> $k) & 1) << ${2 * k + shift})").mkString(" + ")
    """
WITH pts AS (
  SELECT c_custkey,
    CAST((c_custkey % 360) AS DOUBLE) - 180.0 + 0.5 AS lon,
    CAST(((c_custkey * 7) % 180) AS DOUBLE) - 90.0 + 0.5 AS lat
  FROM customer
), q AS (
  SELECT c_custkey,
    least(greatest(CAST(trunc(((lon - -180.0) / 360.0) * 256) AS BIGINT), 0), 255) AS qx,
    least(greatest(CAST(trunc(((lat - -90.0) / 180.0) * 256) AS BIGINT), 0), 255) AS qy
  FROM pts
)
SELECT c_custkey, (""" + spread("qx", 0) + ") + (" + spread("qy", 1) +
      ") AS cell FROM q"
  }

  // ---- salted two-stage aggregation (skew tool) ----
  /** Result identical to the plain groupBy (the oracle states exactly
    * that); the VALUE is the two-exchange plan that spreads a hot
    * key's rows across 16 stage-one reducers. DECIMAL sums make the
    * split order-independent and engine-exact. */
  def saltedAgg(spark: SparkSession, sf: String): DataFrame = {
    val li = t(spark, sf, "lineitem")
      .withColumn("qty_dec", col("l_quantity").cast("decimal(18,2)"))
      .withColumn("price_dec", col("l_extendedprice").cast("decimal(18,2)"))
    graft.operators.Skew.saltedSums(li, Seq("l_returnflag"),
      Seq(sum(col("qty_dec")), sum(col("price_dec"))),
      Seq("sum_qty", "sum_price"),
      saltFrom = "l_orderkey", buckets = 16)
      .select(col("l_returnflag"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("sum_price").cast("double").as("sum_price"))
  }

  val saltedAggSql: String = """
SELECT l_returnflag,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem GROUP BY 1"""

  // ---- sessionization (gap-based) over the event stream ----
  /** Classic lag/cumulative-flag sessionizer: a >30-minute silence
    * starts a new session. Pure window functions — one shuffle on
    * user_id, identical semantics in any SQL engine. */
  def sessionize(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(spark, sf, "events")
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val withGap = e
      .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"),
          1L).otherwise(0L))
    val withSid = withGap.withColumn("session_id",
      sum("new_session").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withSid.groupBy("user_id", "session_id").agg(
      count(lit(1)).as("n_events"),
      min("ts").as("session_start"),
      max("ts").as("session_end"))
  }

  val sessionizeSql: String = """
WITH g AS (
  SELECT user_id, event_id, ts,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
f AS (
  SELECT user_id, event_id, ts,
    CASE WHEN prev_ts IS NULL
      OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM g
),
s AS (
  SELECT user_id, ts,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM f
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
  CAST(count(*) AS BIGINT) AS n_events,
  min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY 1, 2"""

  // ---- rollup (hierarchical totals) ----
  def rollupPricing(spark: SparkSession, sf: String): DataFrame = {
    val li = t(spark, sf, "lineitem")
    li.rollup("l_returnflag", "l_linestatus").agg(
      sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
        .as("sum_qty"),
      count(lit(1)).as("cnt"))
  }

  val rollupPricingSql: String = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(count(*) AS BIGINT) AS cnt
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""

  // ---- as-of join (backward): purchase → latest prior click ----
  def asofClicks(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "events")
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    // unique (user, ts) on the right pins tie semantics
    val clicks = e.where(col("event_type") === "click")
      .groupBy("user_id", "ts")
      .agg(max("value").as("click_value"))
      .withColumn("click_ts", col("ts"))
    graft.operators.Joins.asofBackward(purchases, clicks, "user_id",
      "ts", Seq("click_ts", "click_value"))
  }

  /** DuckDB has native ASOF JOIN — the oracle states the semantics
    * directly. */
  val asofClicksSql: String = """
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts, ts AS click_ts, max(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, p.ts, p.value, c.click_ts, c.click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"""

  // ---- range join: event values vs overlapping nation bands ----
  def rangeBands(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "events").select("event_id", "value")
    val bands = t(spark, sf, "nation").select(
      col("n_nationkey").as("band_id"),
      (col("n_nationkey").cast("double") * 18.0).as("lo"),
      (col("n_nationkey").cast("double") * 18.0 + 40.0).as("hi"))
    graft.operators.Joins.rangeJoin(e, "value", bands, "lo", "hi",
      bucketWidth = 40.0)
      .select("event_id", "band_id", "value", "lo", "hi")
  }

  val rangeBandsSql: String = """
WITH bands AS (
  SELECT n_nationkey AS band_id,
    CAST(n_nationkey AS DOUBLE) * 18.0 AS lo,
    CAST(n_nationkey AS DOUBLE) * 18.0 + 40.0 AS hi
  FROM nation
)
SELECT e.event_id, b.band_id, e.value, b.lo, b.hi
FROM events e JOIN bands b ON e.value >= b.lo AND e.value <= b.hi"""
}
