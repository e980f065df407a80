package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational extension operators over the star schema (SURVEY §2.5):
  * joins, aggregates, windows, set ops, rollup, as-of join — each a thin
  * declarative composition so Catalyst keeps pushdown/broadcast/AQE.
  *
  * Money math: inputs are 2-decimal doubles; sums are computed over
  * `DECIMAL(18,2)` so the aggregate is exact and order-independent
  * (double summation order differs run-to-run under partial aggregation),
  * then surfaced back as DOUBLE.
  */
object Relational {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  // scale 4 (not 2): a 2dp×2dp discount product is exactly 4dp — keeping
  // all four digits means no rounding happens at all on either engine.
  private def money(c: Column): Column = c.cast("decimal(38,4)").cast("double")

  def tables(spark: SparkSession, dir: String, names: String*): Map[String, DataFrame] =
    names.map(n => n -> spark.read.parquet(s"$dir/$n.parquet")).toMap

  /** Pricing summary (TPC-H Q1 shape): one hash aggregate with map-side
    * partial aggregation; shuffle is #groups (~6 rows), never data-sized.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(dec(col("l_quantity")))).as("sum_qty"),
        money(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        money(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Shipping-priority shape (TPC-H Q3): two joins; `customer` is the small
    * side and broadcast, so only `orders⋈lineitem` shuffles on the join key.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      segment: String = "BUILDING", topN: Int = 10): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.where(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(money(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(topN)

  /** Regional revenue (TPC-H Q5 shape): the dimension chain
    * region→nation→customer/supplier is broadcast end-to-end; the single
    * data-sized shuffle is lineitem⋈orders.
    */
  def regionalRevenue(ts: Map[String, DataFrame]): DataFrame =
    ts("lineitem")
      .join(ts("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(ts("customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(ts("supplier")), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(ts("nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(ts("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(money(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))

  /** Ranking window: top-N customers by account balance per nation. */
  def topCustomersPerNation(customer: DataFrame, nation: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= n)
      .select(col("n_name"), col("rnk"), col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("n_name"), col("rnk"))
  }

  /** Rollup aggregate: order counts by status with subtotals + grand total. */
  def orderStatusRollup(orders: DataFrame): DataFrame =
    orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), money(sum(dec(col("o_totalprice")))).as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Set ops: customers with open ('O') orders but no finished ('F') orders.
    * Expressed as key-set EXCEPT — compiles to hash-aggregated anti join.
    */
  def openNotFinishedCustomers(orders: DataFrame): DataFrame =
    orders.where(col("o_orderstatus") === "O").select(col("o_custkey"))
      .except(orders.where(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy(col("o_custkey"))

  /** Semi/anti join pair: parts that appear / never appear in lineitem. */
  def partsNeverOrdered(part: DataFrame, lineitem: DataFrame): DataFrame =
    part.join(lineitem, col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  /** Set ops: customers with both open and finished orders (INTERSECT). */
  def openAndFinishedCustomers(orders: DataFrame): DataFrame =
    orders.where(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersect(orders.where(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy(col("o_custkey"))

  /** Cube aggregate over two dims — every grouping-set combination. */
  def returnStatusCube(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), money(sum(dec(col("l_quantity")))).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Analytic-window suite over customer balances: rank family, offsets,
    * running aggregate, ntile — one pass, one shuffle on the partition key.
    */
  def customerBalanceWindows(customer: DataFrame, nation: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("n_name")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wRange = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .where(col("c_custkey") <= 300)
      .select(
        col("n_name"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        lag(col("c_custkey"), 1).over(w).as("prev_cust"),
        lead(col("c_custkey"), 1).over(w).as("next_cust"),
        count(lit(1)).over(wRange).as("running_n"))
      .orderBy(col("n_name"), col("rn"))
  }

  /** JSON scalar extraction over the events stream table
    * (`get_json_object(props, '$.k')`, SURVEY §2.5).
    */
  def eventPropStats(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Banded range join: rows ⋈ intervals on `start <= ts < end` without a
    * cross join. Each interval is exploded into the fixed-width time
    * buckets it covers; rows equi-join on their bucket, then the exact
    * range predicate filters. The shuffle key is the bucket, so cost is
    * O(rows + intervals×span/width) instead of O(rows×intervals) — pick
    * `bucketWidthSec` near the typical interval length.
    */
  def bandedRangeJoin(
      rows: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketWidthSec: Long = 3600L): DataFrame = {
    val w = bucketWidthSec * 1000000L // µs
    val rowsB = rows.withColumn("__bucket", expr(s"unix_micros($tsCol) div $w"))
    val intsB = intervals.withColumn("__bucket",
      explode(sequence(
        expr(s"unix_micros($startCol) div $w"),
        expr(s"(unix_micros($endCol) - 1) div $w"))))
    rowsB.join(intsB, Seq("__bucket"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  /** As-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` in the same partition key — the time-series
    * operator the reference lacks. Implemented by unioning both sides and
    * running one `last(_, ignoreNulls)` window per key ordered by
    * (ts, side) — a single shuffle on the key, no range cross join, so it
    * survives arbitrary scale and skew is bounded by the hottest key.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      rightValCols: Seq[String]): DataFrame = {
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        rightValCols.map(c => col(c).as(s"__r_$c")): _*)
    val lAligned = lTagged.select(
      lTagged.columns.map(col) ++
        rightValCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val unioned = lAligned.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightValCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled
      .where(col("__side") === 1)
      .drop((rightValCols.map(c => s"__r_$c") ++ Seq("__ts", "__side")): _*)
  }
}
