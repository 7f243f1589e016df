package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** 7-day moving average of daily event value per type — the window
    * FRAME feature (`rowsBetween`) over pre-aggregated daily rows.
    * Scale shape: the frame runs over the DAILY aggregate (≤366 rows
    * per type per year), not raw events — aggregate first, window the
    * small result. Frame sums accumulate in DECIMAL (a double sum's
    * value would depend on the frame's physical add order); the mean
    * divides by the frame's actual row count, so the first 6 days
    * average over the days seen so far.
    */
  def movingAvgDaily(events: DataFrame, days: Int = 7): DataFrame = {
    val daily = events
      .groupBy(
        date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"))
      .agg(dsum(col("value")).as("_d"))
    val frame = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-(days - 1), Window.currentRow)
    daily.select(col("day"), col("event_type"),
      round((sum(col("_d")).over(frame).cast("double") /
        count(lit(1)).over(frame)), 6).as(s"avg_${days}d"))
  }

  /** Ordered conversion funnel: view → click (after the view) →
    * purchase (after that click), per user, summarized as one row of
    * stage survivor counts. Each stage's timestamp is the EARLIEST
    * event strictly after the previous stage's — the standard funnel
    * semantics (a click before any view doesn't count).
    *
    * Scale shape: three grouped aggregations all keyed on user_id (the
    * partitioning is reused across stages — one logical shuffle key),
    * each stage joining the per-user frontier (1 row per surviving
    * user) back to its event slice; no window over raw events, no
    * self-join of the full table.
    */
  def conversionFunnel(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("vts"))
    val c = events.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("vts"))
      .groupBy("user_id").agg(min(col("ts")).as("cts"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("cts"))
      .groupBy("user_id").agg(min(col("ts")).as("pts"))
    v.select(lit("funnel").as("stage_set"), count(lit(1)).as("n_view"))
      .crossJoin(c.select(count(lit(1)).as("n_click_after_view")))
      .crossJoin(p.select(count(lit(1)).as("n_purchase_after_click")))
  }

  /** INTERVAL JOIN, bucket-blocked: every interval `(interval_id, t0,
    * t1)` (microsecond epochs, half-open `[t0, t1)`) is matched with
    * every point `(point_id, t)` it contains, without an equi key.
    *
    * A pure range predicate has no equi-join key, so Catalyst can only
    * execute it as a broadcast-nested-loop / cartesian — O(|I|·|P|)
    * comparisons, the plan that dies first at scale. This blocks both
    * sides into fixed-width time buckets instead: an interval is
    * replicated to every bucket it overlaps (⌈len/bucketUs⌉+1 at most —
    * choose `bucketUs` ≈ the typical interval length so that's ≤ 2), a
    * point lands in exactly 1 — so ONE shuffled equi-join on `bucket` +
    * the residual range filter produces each qualifying pair exactly
    * once (no post-dedup needed: the point's single bucket appears at
    * most once in the interval's bucket list). Shuffle is keyed on time
    * buckets — uniform for event streams; a hot bucket is AQE-skew
    * territory, not a plan defect.
    */
  def intervalJoin(intervals: DataFrame, points: DataFrame,
                   bucketUs: Long): DataFrame = {
    val ib = intervals.withColumn("bucket",
      explode(sequence(floor(col("t0") / bucketUs),
        floor((col("t1") - 1) / bucketUs))))
    val pb = points.withColumn("bucket", floor(col("t") / bucketUs))
    ib.join(pb, Seq("bucket"))
      .filter(col("t") >= col("t0") && col("t") < col("t1"))
      .drop("bucket")
  }

  /** Error-burst attribution through [[intervalJoin]]: each `error`
    * event opens a `[ts, ts+window)` interval; count the `click`
    * events (any user — deliberately no equi key) inside each window.
    * Zero-click windows kept via the left join back to the intervals.
    */
  def errorWindowClicks(events: DataFrame, windowMinutes: Int = 5): DataFrame = {
    val winUs = windowMinutes * 60L * 1000000L
    // ts arrives TIMESTAMP_NTZ (Tables.events); the UTC-pinned session
    // makes the instant cast exact, and bucket math runs on µs longs
    val us = (c: Column) => unix_micros(c.cast("timestamp"))
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("interval_id"), us(col("ts")).as("t0"))
      .withColumn("t1", col("t0") + lit(winUs))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("point_id"), us(col("ts")).as("t"))
    val hits = intervalJoin(errors, clicks, winUs)
      .groupBy("interval_id").agg(count(lit(1)).as("n_clicks"))
    errors.select(col("interval_id").as("event_id"))
      .join(hits.withColumnRenamed("interval_id", "event_id"), Seq("event_id"), "left")
      .select(col("event_id"), coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
  }

  /** Purchase→click basket join: for each purchase, ALL of the same
    * user's clicks in the preceding hour (the multi-row complement of
    * [[AsofJoin.purchaseAttribution]], which keeps only the latest).
    * Equi key (user_id) + range predicate → Catalyst executes the equi
    * part as a shuffled hash join and the range as a residual filter;
    * the streaming twin ([[graft.streaming.EventStreams.purchaseClickJoin]])
    * runs the IDENTICAL condition with watermark-bounded state.
    */
  def purchaseClicks(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    p.join(c, col("user_id") === col("c_user") &&
        col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("cts") < col("pts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"))
  }
}
