package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — attribution over live
  * event streams (beyond the batch-only reference): each purchase
  * pairs with the same user's clicks from the preceding
  * `windowMinutes`. Both sides are buffered in the state store; the
  * time-range join condition plus the two watermarks let Spark PROVE
  * when a buffered row can no longer match and evict it, so state is
  * bounded by (rate × window + lateness), not stream length — the
  * property that makes this runnable forever at production rates.
  */
object EventJoin {

  /** @param purchases streaming (p_user, p_ts, p_value)
    * @param clicks    streaming (c_user, c_ts, c_value)
    * @return          inner-join pairs (one row per purchase × each
    *                  click of that user within the lookback window)
    */
  def purchasesWithRecentClicks(purchases: DataFrame, clicks: DataFrame,
      windowMinutes: Int, watermark: String): DataFrame = {
    val p = purchases.withWatermark("p_ts", watermark)
    val c = clicks.withWatermark("c_ts", watermark)
    p.join(c, expr(
      s"""p_user = c_user AND
          c_ts BETWEEN p_ts - INTERVAL $windowMinutes MINUTES AND p_ts"""))
      .select(col("p_user").as("user_id"), col("p_ts"), col("p_value"),
        col("c_ts"), col("c_value"))
  }

  /** Left-outer variant — the streaming analogue of the batch as-of
    * join's outer semantics ([[graft.operators.Joins.asofBackward]]):
    * EVERY purchase emits; one with no click in its lookback window
    * emits exactly once with NULL click columns, as soon as the click
    * watermark proves no matching click can still arrive. Same
    * bounded-state story as the inner join — the outer row is held
    * only until the watermark passes its window. */
  def purchasesWithRecentClicksOuter(purchases: DataFrame,
      clicks: DataFrame, windowMinutes: Int,
      watermark: String): DataFrame = {
    val p = purchases.withWatermark("p_ts", watermark)
    val c = clicks.withWatermark("c_ts", watermark)
    p.join(c, expr(
      s"""p_user = c_user AND
          c_ts BETWEEN p_ts - INTERVAL $windowMinutes MINUTES AND p_ts"""),
      "leftOuter")
      .select(col("p_user").as("user_id"), col("p_ts"), col("p_value"),
        col("c_ts"), col("c_value"))
  }
}
