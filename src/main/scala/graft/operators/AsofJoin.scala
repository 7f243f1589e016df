package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-earlier) join — an operator Spark has no native form
  * of (SURVEY.md §2.2 joins row). Composed from existing ops per the
  * preference order: a tagged union + one ordered window per key, no
  * custom physical operator needed.
  *
  * Shape: UNION the two sides with a kind tag, window over the key
  * ordered by (ts, kind, id), and carry the last left-side row forward
  * with `last(_, ignoreNulls = true)`. One shuffle on the key; state
  * per key is a single carried value — the classic scalable as-of
  * (beats a range-join which rescans candidates per row). Rows of the
  * right side at the same timestamp sort AFTER the left side (kind
  * tag), so "as of" includes same-instant left rows; all orderings
  * carry id tie-breaks for determinism.
  */
object AsofJoin {

  /** For each `right` row, attach the most recent `left` row (by `ts`,
    * ties broken by `idCol`) with the same `key` and ts ≤ right.ts.
    * Output: right's (key, idCol, ts) + asof_id / asof_ts (null when no
    * earlier left row exists).
    */
  def asof(left: DataFrame, right: DataFrame,
           key: String = "user_id", ts: String = "ts", idCol: String = "event_id"): DataFrame = {
    val l = left.select(col(key), col(ts), col(idCol), lit(0).as("kind"))
    val r = right.select(col(key), col(ts), col(idCol), lit(1).as("kind"))
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("kind"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_id",
        last(when(col("kind") === 0, col(idCol)), ignoreNulls = true).over(w))
      .withColumn("asof_ts",
        last(when(col("kind") === 0, col(ts)), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col(key), col(idCol), col(ts), col("asof_id"), col("asof_ts"))
  }

  /** Purchase attribution over the events table: for every `purchase`,
    * the latest prior `view` by the same user, with the gap in exact
    * microseconds (integer arithmetic — no epoch-seconds truncation
    * ambiguity between engines).
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
    val purchases = events.filter(col("event_type") === "purchase")
    asof(views, purchases)
      .select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        col("asof_id").as("view_id"),
        (unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("asof_ts").cast("timestamp"))).as("gap_us"))
  }
}
