package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Event-stream operators in their *batch* form (the oracled surface;
  * Structured Streaming variants in `graft.streaming` share the same
  * column logic). The reference has no time/stream surface at all
  * (SURVEY.md §2.2) — this is the extended LLM-pipeline surface.
  *
  * Scale notes: tumbling windows are a single hash aggregation keyed on
  * (window, type) — partial aggregation map-side, one shuffle.
  * Sessionization shuffles once on user_id (the natural key); state per
  * user is a sort within its partition, so skew only matters for a
  * pathological single-user firehose (then: salt by day first).
  */
object Events {

  /** Tumbling 1-hour windows per event_type: count + exact double sum of
    * `value` (order-independent via decimal accumulation — Portable.dsum).
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsumRounded(col("value")).as("sum_value"))

  /** SLIDING 2-hour windows advancing hourly, per event_type: each
    * event lands in exactly 2 overlapping windows (Spark's `window()`
    * generator — a bounded ×(len/slide) row expansion map-side, then
    * the same single (window, type) hash aggregation as
    * [[tumblingCounts]]; no self-join, no range join). The
    * trend-smoothing readout of monitoring/curation dashboards.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "2 hours", "1 hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsumRounded(col("value")).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based sessionization (30-min inactivity gap): one row per
    * session with bounds and size. Window partitioned by user_id —
    * single shuffle, narrow state.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // interval comparison, not epoch-seconds math: exact at any timestamp
    // precision and identical in the DuckDB oracle
    val newSession = when(
      col("prev_ts").isNull ||
        col("ts") - col("prev_ts") > expr(s"INTERVAL '$gapMinutes' MINUTE"),
      1L).otherwise(0L)
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("is_new", newSession)
      .withColumn("session_no", sum("is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_no")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts").as("session_start"),
        max("ts").as("session_end"))
  }

  /** Per-user spend on purchase events (JSON `props.k` extracted as a
    * typed column on the way). Top spenders, deterministic tie-break.
    */
  def topPurchasers(events: DataFrame, limit: Int = 50): DataFrame =
    events
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_purchases"),
        dsumRounded(col("value")).as("total_value"),
        sum("k").as("sum_k"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(limit)

  /** Per-user error rates: conditional aggregation (count/sum under a
    * predicate) — one pass, no self-join; the FILTER-clause shape.
    * Rate is exact integer-over-integer division in double, rounded.
    */
  def errorRates(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "error", 1)).as("n_errors"),
        dsumRounded(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)))
          .as("purchase_value"))
      .withColumn("error_rate",
        round(col("n_errors").cast("double") / col("n_events"), 6))

  /** Per-type daily event rates: counts per (day, type) with a ranking
    * window — exercises date_trunc + rank over aggregated rows.
    */
  def dailyTypeRank(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(
        date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    daily.withColumn("rnk",
      rank().over(Window.partitionBy("day").orderBy(col("n").desc, col("event_type"))))
  }
}
