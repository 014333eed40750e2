package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables.{load, r6}

/**
 * Window functions from SURVEY.md §2.5 (reference pipeline: Sort →
 * [Overlap kernels] → ComputeWindow → Project,
 * PhysicalPlanGenerator.h:295-401). Reference supports MIN/MAX/SUM/AVG/
 * COUNT/ROW_NUMBER/LAG/LEAD/FIRST_VALUE/LAST_VALUE with ROWS frames
 * (GroupBy.cpp:84-121); RANK/DENSE_RANK/NTILE/PERCENT_RANK and RANGE frames
 * are deliberate supersets here (rejected by the reference,
 * BatchWindowFunctionProcessing.cpp:60, PhysicalPlanGenerator.h:304-306).
 *
 * Every OVER clause orders by a total key (ties broken by a unique id) so
 * results are deterministic, and windowed double sums go through
 * DECIMAL(18,6) (see Tables.dsum rationale) because Spark and DuckDB
 * accumulate sliding frames in different orders.
 */
object WindowQueries extends QueryPack {

  private val dec = DecimalType(18, 6)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- ROW_NUMBER top-k per group (classic partitioned window)
    "q32_window_rownum" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      load(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_nationkey"), col("rn"))
    }),

    // ---- LAG / LEAD with default offset and explicit n (GroupBy.h LAG/LEAD)
    "q33_window_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      load(s, dir, "orders")
        .filter(col("o_custkey") < 60)
        .select(
          col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          lag(col("o_totalprice"), 2).over(w).as("prev2_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- Bounded ROWS frame: moving sum/avg/min/max over 2 preceding
    // (reference cudf::grouped_rolling_window path)
    "q34_window_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      load(s, dir, "events")
        .filter(col("user_id") < 10)
        .select(
          col("user_id"), col("event_id"),
          sum(col("value").cast(dec)).over(w).cast(DoubleType).as("mov_sum"),
          min(col("value")).over(w).as("mov_min"),
          max(col("value")).over(w).as("mov_max"),
          count(lit(1)).over(w).as("mov_n"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- Unbounded frames: running total + FIRST/LAST_VALUE over the whole
    // partition (reference full-extent grouped_rolling_window,
    // BatchWindowFunctionProcessing.cpp:150)
    "q35_window_unbounded" -> ((s, dir) => {
      val ordered = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val full = ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      load(s, dir, "orders")
        .filter(col("o_custkey") < 40)
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(dec)).over(running).cast(DoubleType).as("running_total"),
          first(col("o_orderkey")).over(full).as("first_order"),
          last(col("o_orderkey")).over(full).as("last_order"),
          count(lit(1)).over(full).as("n_orders"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- Ranking family (superset: RANK/DENSE_RANK TODO'd in reference,
    // BatchWindowFunctionProcessing.cpp:60; NTILE/PERCENT_RANK absent)
    "q36_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 400)
        .select(
          col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          r6(percent_rank().over(w)).as("pct_rank"))
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- [S] multiple different OVER clauses in one SELECT
    "q61_window_multi" -> multiWindowQuery,

    // ---- [S] RANGE frame (value-based bounds): the reference rejects
    // RANGE outright ("RANGE is not currently supported",
    // PhysicalPlanGenerator.h:304-306). SQL path: the Scala DSL's
    // rangeBetween only takes Long bounds, which don't match a DOUBLE
    // ordering column.
    "q62_window_range" -> ((s, dir) => {
      graft.EngineContext.forDir(s, dir).sql(
        """SELECT c_custkey, c_nationkey, c_acctbal,
          |count(*) OVER w AS peers_within_500,
          |min(c_acctbal) OVER w AS band_min,
          |max(c_acctbal) OVER w AS band_max
          |FROM customer WHERE c_custkey < 400
          |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal
          |             RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // ---- Window with no PARTITION BY (reference needed Overlap kernels for
    // this, §2.5; Spark funnels to a single partition — fine after the
    // pre-aggregation shrinks the input, which is how this stays scalable)
    "q37_window_nopartition" -> ((s, dir) => {
      val daily = load(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("d")).rowsBetween(-6, 0)
      daily
        .select(
          date_format(col("d"), "yyyy-MM-dd").as("d"), col("n"),
          sum(col("n")).over(w).as("n_7d"),
          row_number().over(Window.orderBy(col("d"))).as("day_idx"))
        .filter(col("d") < lit("1995-06-01").cast("date"))
        .orderBy(col("d"))
    })
  )

  private val multiWindowQuery: (SparkSession, String) => DataFrame = (s, dir) => {
    // [S] Multiple DIFFERENT OVER clauses in one SELECT — the reference
    // rejects this outright (PhysicalPlanGenerator.h:300-302); Spark plans
    // one Window exec per distinct spec.
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byStatus = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    load(s, dir, "orders")
      .filter(col("o_custkey") < 30)
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        row_number().over(byCust).as("seq_for_cust"),
        row_number().over(byStatus).as("rank_in_status"),
        lag(col("o_totalprice"), 1).over(byCust).as("prev_price"))
      .orderBy(col("o_orderkey"))
  }

  def oracleSql: Map[String, String] = Map(
    "q62_window_range" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |count(*) OVER w AS peers_within_500,
        |min(c_acctbal) OVER w AS band_min,
        |max(c_acctbal) OVER w AS band_max
        |FROM customer WHERE c_custkey < 400
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal
        |             RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,

    "q61_window_multi" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS seq_for_cust,
        |CAST(row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank_in_status,
        |lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders WHERE o_custkey < 30
        |ORDER BY o_orderkey""".stripMargin,
    "q32_window_rownum" ->
      """SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |         CAST(row_number() OVER (PARTITION BY c_nationkey
        |                            ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
        |  FROM customer)
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,

    "q33_window_lag_lead" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |o_totalprice,
        |lag(o_totalprice, 1) OVER w AS prev_price,
        |lead(o_totalprice, 1) OVER w AS next_price,
        |lag(o_totalprice, 2) OVER w AS prev2_price
        |FROM orders WHERE o_custkey < 60
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q34_window_frame" ->
      """SELECT user_id, event_id,
        |CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS mov_sum,
        |min(value) OVER w AS mov_min,
        |max(value) OVER w AS mov_max,
        |count(*) OVER w AS mov_n
        |FROM events WHERE user_id < 10
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q35_window_unbounded" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER r AS DOUBLE) AS running_total,
        |first_value(o_orderkey) OVER f AS first_order,
        |last_value(o_orderkey) OVER f AS last_order,
        |count(*) OVER f AS n_orders
        |FROM orders WHERE o_custkey < 40
        |WINDOW r AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       f AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q36_window_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |CAST(rank() OVER w AS INT) AS rnk,
        |CAST(dense_rank() OVER w AS INT) AS drnk,
        |CAST(ntile(4) OVER w AS INT) AS quartile,
        |round(percent_rank() OVER w, 6) AS pct_rank
        |FROM lineitem WHERE l_orderkey < 400
        |WINDOW w AS (PARTITION BY l_returnflag
        |             ORDER BY l_quantity, l_orderkey, l_linenumber)
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin,

    // note: window computed over ALL days, filter applied after (matches the
    // Spark plan, where .filter follows the window projection)
    "q37_window_nopartition" ->
      """SELECT strftime(d, '%Y-%m-%d') AS d, n, n_7d, day_idx FROM (
        |  SELECT d, n,
        |  CAST(sum(n) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d,
        |  CAST(row_number() OVER (ORDER BY d) AS INT) AS day_idx
        |  FROM (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
        |        FROM orders GROUP BY CAST(o_orderdate AS DATE)))
        |WHERE d < DATE '1995-06-01'
        |ORDER BY d""".stripMargin
  )
}
