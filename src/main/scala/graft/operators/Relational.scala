package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable._
import graft.sources.Tables

/** Relational analytics over the TPC-H-ish star schema. The reference
  * has no relational layer (SURVEY.md §2.2) — these queries are the
  * extended surface, expressed as pure declarative DataFrame plans so
  * Catalyst gets every optimization: filter/projection pushdown into the
  * Parquet scans, broadcast joins for the small dimensions (nation,
  * customer, supplier are tiny at every sf), partial aggregation before
  * the single shuffle.
  *
  * All double sums go through Portable.dsum (decimal accumulation) —
  * identical results at any partition count, which is what makes them
  * oracle-hashable AND cluster-size-invariant at 100 TB.
  */
object Relational {

  /** TPC-H Q1-style pricing summary over lineitem: one wide aggregate,
    * map-side partial agg then a 6-group shuffle. Linear scan, no join.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsumRounded(col("l_quantity")).as("sum_qty"),
        dsumRounded(col("l_extendedprice")).as("sum_base_price"),
        dsumRounded(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsumRounded(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        dmean(col("l_quantity")).as("avg_qty"),
        dmean(col("l_extendedprice")).as("avg_price"),
        dmean(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Revenue by nation: lineitem ⋈ orders ⋈ customer ⋈ nation.
    * customer+nation are broadcast (small dims); the only real shuffle
    * is lineitem⋈orders on orderkey, then an agg with 25 groups.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        dsumRounded(col("rev")).as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** Order-priority distribution by month — orders-only rollup. */
  def ordersByPriority(orders: DataFrame): DataFrame =
    orders
      .groupBy(
        date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsumRounded(col("o_totalprice")).as("sum_price"))

  /** Top revenue parts: lineitem ⋈ part (broadcast), grouped on brand.
    * Part is a broadcastable dim at every sf (200 rows at sf0.001).
    */
  def revenueByBrand(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        dsumRounded(col("rev")).as("revenue"),
        dsumRounded(col("l_quantity")).as("sum_qty"))
  }

  /** TPC-H Q3-style shipping priority: BUILDING-segment orders placed
    * before the pivot date, revenue from lineitems shipped after it,
    * top 10 by revenue. Customer is broadcast; both date filters are
    * pushed into the Parquet scans; final top-k is
    * TakeOrderedAndProject.
    */
  def shippingPriority(spark: SparkSession, dir: String, pivot: String = "1998-01-01"): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit(pivot).cast("date"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit(pivot).cast("date"))
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(dsumRounded(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      // date output (not raw ltz timestamp) so both engines print alike
      .select(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
  }

  /** Exact interpolated percentiles of extended price per return flag
    * (sort-based percentile aggregation; linear interpolation matches
    * DuckDB quantile_cont).
    */
  def priceQuantiles(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"),
        round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99"))

  /** Exact distinct-user counts per event type (distinct aggregation —
    * plans as the standard two-phase expand/aggregate).
    */
  def distinctUsers(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  /** ROLLUP over (returnflag, linestatus): subtotals + grand total in
    * one pass (Spark expands grouping sets before the single shuffle).
    */
  def rollupPricing(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_items"),
        dsumRounded(col("l_quantity")).as("sum_qty"))

  /** Set-op pipeline: customers ∩ open-order buyers ∖ F-status buyers —
    * exercises INTERSECT/EXCEPT (both plan as aggregated semi/anti
    * joins; no counterpart at all in the reference).
    */
  def openNotFulfilled(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey")
    val ord = Tables.orders(spark, dir)
    cust
      .intersect(ord.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("c_custkey")))
      .except(ord.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("c_custkey")))
  }

  /** Market-segment × order-status matrix (semi-join shaped: customer
    * broadcast into orders, two-column rollup).
    */
  def segmentStatus(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select("o_custkey", "o_orderstatus", "o_totalprice")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        dsumRounded(col("o_totalprice")).as("sum_price"))
  }
}
