package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{davg, davgSql, drnd, dsum, dsumSql, load, r6}
import graft.operators.Skew

/** A named set of driver-checkable queries: Spark implementation + DuckDB
  * oracle SQL (column names must match — the driver sorts columns by name
  * and hashes values). */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}

/**
 * Core relational operators from SURVEY.md §2: scan, filter, project,
 * aggregate (partial/final via Catalyst HashAggregate), all five join types
 * + null-safe + theta (reference BatchJoinProcessing.h:17-21), semi/anti
 * (reference rewrites IN/EXISTS pre-engine; Spark plans them natively),
 * union all/distinct (BatchUnionProcessing.cpp), distinct
 * (GroupBy.cpp:205-213), sort with explicit null ordering
 * (OrderBy.cpp:69-85: ASC→nulls last, DESC→nulls first), limit
 * (BatchOrderByProcessing.cpp:583-741), and intersect/except as a
 * deliberate superset (absent in reference, SURVEY §2.7).
 *
 * Every query ends in a total ORDER BY so Spark and the DuckDB oracle agree
 * row-for-row.
 */
object RelationalQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- TPC-H Q1: scan + filter + project arithmetic + grouped agg + sort
    // (reference TPCHSuite.yaml TEST_01; tri-kernel agg of §2.4)
    "q01_tpch_q1" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)
    }),

    // ---- Projection + filter with compound predicates (§2.2)
    "q02_filter_project" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 10 && col("l_returnflag") =!= "A")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * col("l_discount")).as("disc_amount"),
          (col("l_quantity") * lit(2.0) + lit(1.0)).as("qty_calc"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- TPC-H Q3-style 3-way inner join; small dim explicitly broadcast
    // (reference scatter-join decision, BatchJoinProcessing.cpp:672-830)
    "q03_join3_topk" -> ((s, dir) => {
      val c = load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = load(s, dir, "orders").filter(col("o_orderdate") < lit("1999-03-15").cast("timestamp"))
      val l = load(s, dir, "lineitem").filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
      broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc_nulls_first, col("l_orderkey").asc_nulls_last)
        .limit(10)
    }),

    // ---- LEFT OUTER join + double aggregation (TPC-H Q13 shape)
    "q04_join_left" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val o = load(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("order_count"))
        .groupBy(col("order_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc_nulls_first, col("order_count").desc_nulls_first)
    }),

    // ---- RIGHT OUTER join (reference executes as flipped left,
    // BatchJoinProcessing.cpp:424-440; Spark plans it directly)
    "q05_join_right" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
      val p = load(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey"), "right")
        .groupBy(col("p_brand"))
        .agg(
          count(col("l_orderkey")).as("line_count"),
          count(lit(1)).as("row_count"),
          sum(when(col("l_orderkey").isNull, 1).otherwise(0)).as("unmatched_parts"))
        .orderBy(col("p_brand").asc_nulls_last)
    }),

    // ---- FULL OUTER join with guaranteed unmatched rows on both sides
    "q06_join_full" -> ((s, dir) => {
      val c = load(s, dir, "customer").filter(col("c_custkey") < 100)
        .select(col("c_custkey"), col("c_acctbal"))
      val o = load(s, dir, "orders").filter(col("o_custkey") >= 50 && col("o_custkey") < 150)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("key"),
          col("c_custkey").isNotNull.as("has_cust"),
          col("o_custkey").isNotNull.as("has_ord"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("key").asc_nulls_last)
    }),

    // ---- CROSS join (reference condition=[true] → cudf::cross_join)
    "q07_join_cross" -> ((s, dir) => {
      val r = load(s, dir, "region")
      val n = load(s, dir, "nation").filter(col("n_nationkey") < 5)
      r.crossJoin(n)
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // ---- Non-equi join: equality part + inequality residual
    // (reference split_inequality_join_into_join_and_filter,
    // BatchJoinProcessing.cpp:148-247)
    "q08_join_nonequi" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
      val p = load(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey") && col("l_quantity") > col("p_size"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("p_brand").asc_nulls_last)
    }),

    // ---- Pure theta join (no equality keys → nested-loop in Spark)
    "q08b_join_theta" -> ((s, dir) => {
      val r1 = load(s, dir, "region").select(col("r_regionkey").as("k1"), col("r_name").as("name1"))
      val r2 = load(s, dir, "region").select(col("r_regionkey").as("k2"), col("r_name").as("name2"))
      r1.join(r2, col("k1") < col("k2"))
        .select(col("name1"), col("name2"))
        .orderBy(col("name1"), col("name2"))
    }),

    // ---- Null-safe equality join (IS NOT DISTINCT FROM → Spark <=>,
    // reference cudf::null_equality::EQUAL, BatchJoinProcessing.h:35)
    "q09_join_nullsafe" -> ((s, dir) => {
      val c = load(s, dir, "customer")
        .select(col("c_custkey"), nullif(col("c_nationkey") % 5, lit(4)).as("ckey"))
      val sup = load(s, dir, "supplier")
        .select(col("s_suppkey"), nullif(col("s_nationkey") % 5, lit(4)).as("skey"))
      c.join(sup, col("ckey") <=> col("skey"))
        .groupBy(coalesce(col("ckey"), lit(-1)).as("bucket"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("bucket").asc_nulls_last)
    }),

    // ---- Semi join (reference: Calcite rewrites EXISTS pre-engine;
    // Spark plans LeftSemi natively)
    "q10_join_semi" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val l = load(s, dir, "lineitem").filter(col("l_quantity") >= 48)
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority").asc_nulls_last)
    }),

    // ---- Anti join (NOT EXISTS). The orders side is filtered to large
    // orders so the anti result is NON-EMPTY at every SF (the unfiltered
    // form matched a 0-row oracle vacuously — every customer has orders
    // at sf0.01, so the gate could not distinguish a correct predicate
    // from one that filters everything).
    "q11_join_anti" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val o = load(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_custs_without_orders"))
        .orderBy(col("c_mktsegment").asc_nulls_last)
    }),

    // ---- COUNT(DISTINCT) (reference: AggregateExpandDistinctAggregatesRule
    // rewrite; Spark RewriteDistinctAggregates — built in)
    "q12_count_distinct" -> ((s, dir) => {
      // count_multi = reference COUNT(a, b): rows where ALL args valid
      // (GroupBy.cpp:237-241 lowers to combined-validity count)
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_supps"),
          count(lit(1)).as("n_rows"),
          sum(when(nullif(col("l_linenumber"), lit(3)).isNotNull &&
            nullif(col("l_quantity"), lit(10.0)).isNotNull, 1L).otherwise(0L)).as("count_multi"))
        .orderBy(col("l_returnflag").asc_nulls_last)
    }),

    // ---- Global aggregation, no GROUP BY (reference cudf::reduce path,
    // GroupBy.cpp:215-300) + SUM0 semantics via coalesce
    "q13_agg_global" -> ((s, dir) => {
      load(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        davg(col("l_discount")).as("avg_disc"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        coalesce(dsum(when(col("l_quantity") > 1000, col("l_quantity"))), lit(0.0)).as("sum0_demo"))
    }),

    // ---- DISTINCT projection (reference: GROUP BY all cols →
    // drop_duplicates, GroupBy.cpp:205-213)
    "q14_distinct" -> ((s, dir) => {
      load(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    }),

    // ---- UNION ALL (BatchUnionProcessing.cpp)
    "q15_union_all" -> ((s, dir) => {
      val a = load(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("key"), lit("cust").as("src"))
      val b = load(s, dir, "supplier").filter(col("s_acctbal") > 9000)
        .select(col("s_suppkey").as("key"), lit("supp").as("src"))
      a.unionAll(b).orderBy(col("src"), col("key"))
    }),

    // ---- UNION DISTINCT (reference: UNION ALL + group-by-all rewrite,
    // PhysicalPlanGenerator.h:252-294)
    "q16_union_distinct" -> ((s, dir) => {
      val a = load(s, dir, "orders").select((col("o_custkey") % 100).as("bucket"))
      val b = load(s, dir, "customer").select((col("c_custkey") % 100).as("bucket"))
      a.union(b).distinct().orderBy(col("bucket"))
    }),

    // ---- INTERSECT (superset: absent in reference, SURVEY §2.7)
    "q17_intersect" -> ((s, dir) => {
      val a = load(s, dir, "orders").filter(col("o_totalprice") > 300000).select(col("o_custkey").as("key"))
      val b = load(s, dir, "customer").filter(col("c_acctbal") > 5000).select(col("c_custkey").as("key"))
      a.intersect(b).orderBy(col("key"))
    }),

    // ---- EXCEPT (superset: absent in reference). Right side restricted
    // to 'F'-status orders so the difference is NON-EMPTY at every SF
    // (customer-minus-all-orders was a vacuous 0-row gate at sf0.01).
    "q18_except" -> ((s, dir) => {
      val a = load(s, dir, "customer").select(col("c_custkey").as("key"))
      val b = load(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("key"))
      a.except(b).orderBy(col("key"))
    }),

    // ---- ORDER BY with explicit null ordering + LIMIT. Reference defaults:
    // ASC→nulls last, DESC→nulls first (OrderBy.cpp:69-85) — opposite of
    // Spark's ASC default, so the engine always emits explicit orderings.
    "q19_orderby_nulls_limit" -> ((s, dir) => {
      load(s, dir, "customer")
        .select(
          col("c_custkey"),
          nullif(col("c_nationkey") % 7, lit(3)).as("grp"),
          col("c_acctbal"))
        .orderBy(col("grp").asc_nulls_last, col("c_acctbal").desc_nulls_first, col("c_custkey"))
        .limit(25)
    }),

    // ---- LIMIT without ORDER BY (row set is arbitrary → expose only the
    // deterministic count; reference has_limit_only path, OrderBy.cpp:228-233)
    "q20_limit_only" -> ((s, dir) => {
      load(s, dir, "lineitem").limit(1000).agg(count(lit(1)).as("n_rows"))
    }),

    // ---- TPC-H Q5 shape: 6-way join, small dims broadcast, revenue by
    // region (adapted to available columns: customer-nation via c_nationkey,
    // supplier-nation via s_nationkey; the c=s nation constraint kept)
    "q57_tpch_q5" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val o = load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = load(s, dir, "lineitem")
      val sup = load(s, dir, "supplier")
      val n = load(s, dir, "nation")
      val r = load(s, dir, "region")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // ---- UNION type normalization: INT32 ∪ INT64 widens to the common
    // type, column names taken from the left input (reference
    // get_common_types + names-from-left, BatchUnionProcessing.cpp:42-131)
    "q63_union_type_norm" -> ((s, dir) => {
      graft.EngineContext.forDir(s, dir).sql(
        """SELECT key, count(*) AS n FROM (
          |  SELECT n_nationkey AS key FROM nation
          |  UNION ALL
          |  SELECT s_suppkey FROM supplier
          |) GROUP BY key ORDER BY key""".stripMargin)
    }),

    // ---- TPC-H Q6: pure filter + single aggregate (forecasting revenue)
    "q59_tpch_q6" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- TPC-H Q14 shape: conditional revenue ratio over a join
    "q60_tpch_q14" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      val p = load(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(
          dsum(when(col("p_type") === "ECONOMY",
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0)))
            .as("economy_revenue"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
        .select(
          col("economy_revenue"), col("total_revenue"),
          r6(col("economy_revenue") / col("total_revenue") * 100.0).as("economy_pct"))
    }),

    // ---- TPC-H Q10 shape: returned-item revenue per customer — 4-way
    // join, small dims broadcast, revenue-ranked top-k (reference
    // TPCHSuite.yaml TEST_10)
    "q64_tpch_q10" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val o = load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = load(s, dir, "nation")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // ---- TPC-H Q18 shape: large-volume orders via IN-subquery with
    // HAVING (reference TPCHSuite.yaml TEST_18; exercises the SQL path's
    // subquery rewrite into a semi join)
    "q65_tpch_q18" -> ((s, dir) => {
      graft.EngineContext.forDir(s, dir).sql(
        s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           |       ${dsumSql("l_quantity")} AS total_qty
           |FROM customer JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE o_orderkey IN (
           |  SELECT l_orderkey FROM lineitem
           |  GROUP BY l_orderkey HAVING ${dsumSql("l_quantity")} > 150)
           |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
           |ORDER BY o_totalprice DESC, o_orderkey
           |LIMIT 100""".stripMargin)
    }),

    // ---- Exact percentiles (linear interpolation — both engines use the
    // same (1-g)*lo + g*hi rule; rounded to absorb last-bit arithmetic)
    "q58_percentiles" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          drnd(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          drnd(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
          drnd(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"),
          min(col("l_extendedprice")).as("p0"),
          max(col("l_extendedprice")).as("p100"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- Explicit salted join (operators.Skew): orders salted into 8
    // deterministic sub-keys per custkey, customer replicated 8× — the
    // manual hot-key fix AQE can't apply inside a hash join. Salt is
    // routing only; the oracle is the PLAIN join, so the rewrite must be
    // answer-invisible. Aggregated to segment revenue for a stable hash.
    "q119_salted_join" -> ((s, dir) => {
      import graft.Tables.dsum
      graft.operators.Skew.saltedJoin(
          load(s, dir, "orders"), load(s, dir, "customer"),
          bigKey = "o_custkey", smallKey = "c_custkey",
          salts = 8, saltSource = col("o_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---- Salted partition total (operators.Skew): each document's
    // share of its source's bytes — sum(n_chars) OVER (PARTITION BY
    // source) with NO WindowExec and NO big-side shuffle: (source,salt)
    // partials → per-source totals → broadcast back. A hot source is
    // split across 8 reducers instead of serializing one window task.
    "q120_salted_window" -> ((s, dir) => {
      Skew.saltedPartitionSum(
          load(s, dir, "documents"),
          key = col("source"), value = col("n_chars"),
          salts = 8, saltSource = col("doc_id"),
          totalName = "source_chars")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("source_chars"),
          graft.Tables.r6(col("n_chars").cast("double") /
            col("source_chars").cast("double")).as("share"))
        .orderBy(col("doc_id"))
    }),

    // ---- q120 with the totals broadcast FORCED OFF (budget 0): the
    // byte-gate's SHUFFLE_HASH fallback path, sharing q120's oracle — the
    // gate steers the physical plan only, never the answer (the q44/q44b,
    // q72/q72b relationship). PlanAuditSpec pins no-BroadcastHashJoin here.
    "q120b_salted_window_shuffle" -> ((s, dir) => {
      Skew.saltedPartitionSum(
          load(s, dir, "documents"),
          key = col("source"), value = col("n_chars"),
          salts = 8, saltSource = col("doc_id"),
          totalName = "source_chars", broadcastBudgetBytes = 0L)
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("source_chars"),
          graft.Tables.r6(col("n_chars").cast("double") /
            col("source_chars").cast("double")).as("share"))
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${dsumSql("l_quantity")} AS sum_qty,
         |${dsumSql("l_extendedprice")} AS sum_base_price,
         |${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |${dsumSql("(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)")} AS sum_charge,
         |${davgSql("l_quantity")} AS avg_qty,
         |${davgSql("l_extendedprice")} AS avg_price,
         |${davgSql("l_discount")} AS avg_disc,
         |count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |l_extendedprice * l_discount AS disc_amount,
        |l_quantity * 2.0 + 1.0 AS qty_calc
        |FROM lineitem
        |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 10 AND l_returnflag <> 'A'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join3_topk" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         |${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
         |AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
         |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
         |ORDER BY revenue DESC NULLS FIRST, l_orderkey NULLS LAST
         |LIMIT 10""".stripMargin,

    "q04_join_left" ->
      """SELECT order_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS order_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey
        |) GROUP BY order_count
        |ORDER BY custdist DESC NULLS FIRST, order_count DESC NULLS FIRST""".stripMargin,

    "q05_join_right" ->
      """SELECT p_brand, count(l_orderkey) AS line_count, count(*) AS row_count,
        |CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unmatched_parts
        |FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand NULLS LAST""".stripMargin,

    "q06_join_full" ->
      """SELECT coalesce(c_custkey, o_custkey) AS key,
        |c_custkey IS NOT NULL AS has_cust,
        |o_custkey IS NOT NULL AS has_ord,
        |coalesce(n_orders, 0) AS n_orders
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 100) c
        |FULL JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders
        |           WHERE o_custkey >= 50 AND o_custkey < 150 GROUP BY o_custkey) o
        |ON c_custkey = o_custkey
        |ORDER BY key NULLS LAST""".stripMargin,

    "q07_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |WHERE n_nationkey < 5 ORDER BY r_name, n_name""".stripMargin,

    "q08_join_nonequi" ->
      s"""SELECT p_brand, count(*) AS n_rows, ${dsumSql("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
         |GROUP BY p_brand ORDER BY p_brand NULLS LAST""".stripMargin,

    "q08b_join_theta" ->
      """SELECT r1.r_name AS name1, r2.r_name AS name2
        |FROM region r1 JOIN region r2 ON r1.r_regionkey < r2.r_regionkey
        |ORDER BY name1, name2""".stripMargin,

    "q09_join_nullsafe" ->
      """SELECT coalesce(ckey, -1) AS bucket, count(*) AS n_pairs FROM
        |(SELECT c_custkey, nullif(c_nationkey % 5, 4) AS ckey FROM customer) c
        |JOIN (SELECT s_suppkey, nullif(s_nationkey % 5, 4) AS skey FROM supplier) s
        |ON ckey IS NOT DISTINCT FROM skey
        |GROUP BY coalesce(ckey, -1) ORDER BY bucket NULLS LAST""".stripMargin,

    "q10_join_semi" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS LAST""".stripMargin,

    "q11_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_custs_without_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS LAST""".stripMargin,

    "q12_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts,
        |count(DISTINCT l_suppkey) AS distinct_supps, count(*) AS n_rows,
        |CAST(sum(CASE WHEN nullif(l_linenumber, 3) IS NOT NULL
        |               AND nullif(l_quantity, 10.0) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS count_multi
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag NULLS LAST""".stripMargin,

    "q13_agg_global" ->
      s"""SELECT count(*) AS n_rows, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         |${dsumSql("l_extendedprice")} AS sum_price, ${davgSql("l_discount")} AS avg_disc,
         |count(DISTINCT l_orderkey) AS n_orders,
         |coalesce(${dsumSql("CASE WHEN l_quantity > 1000 THEN l_quantity END")}, 0.0) AS sum0_demo
         |FROM lineitem""".stripMargin,

    "q14_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q15_union_all" ->
      """SELECT * FROM (
        |SELECT c_custkey AS key, 'cust' AS src FROM customer WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT s_suppkey AS key, 'supp' AS src FROM supplier WHERE s_acctbal > 9000
        |) ORDER BY src, key""".stripMargin,

    "q16_union_distinct" ->
      """SELECT * FROM (
        |SELECT o_custkey % 100 AS bucket FROM orders
        |UNION
        |SELECT c_custkey % 100 AS bucket FROM customer
        |) ORDER BY bucket""".stripMargin,

    "q17_intersect" ->
      """SELECT * FROM (
        |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 300000
        |INTERSECT
        |SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
        |) ORDER BY key""".stripMargin,

    "q18_except" ->
      """SELECT * FROM (
        |SELECT c_custkey AS key FROM customer
        |EXCEPT
        |SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
        |) ORDER BY key""".stripMargin,

    "q19_orderby_nulls_limit" ->
      """SELECT c_custkey, nullif(c_nationkey % 7, 3) AS grp, c_acctbal
        |FROM customer
        |ORDER BY grp ASC NULLS LAST, c_acctbal DESC NULLS FIRST, c_custkey
        |LIMIT 25""".stripMargin,

    "q20_limit_only" ->
      "SELECT count(*) AS n_rows FROM (SELECT * FROM lineitem LIMIT 1000)",

    "q57_tpch_q5" ->
      s"""SELECT r_name, n_name,
         |${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |count(*) AS n_lines
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q63_union_type_norm" ->
      """SELECT key, count(*) AS n FROM (
        |  SELECT n_nationkey AS key FROM nation
        |  UNION ALL
        |  SELECT s_suppkey FROM supplier
        |) GROUP BY key ORDER BY key""".stripMargin,

    "q59_tpch_q6" ->
      s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue, count(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,

    "q60_tpch_q14" ->
      s"""SELECT economy_revenue, total_revenue,
         |round(economy_revenue / total_revenue * 100.0, 6) AS economy_pct
         |FROM (
         |  SELECT
         |    ${dsumSql("CASE WHEN p_type = 'ECONOMY' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS economy_revenue,
         |    ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00')""".stripMargin,

    "q64_tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "q65_tpch_q18" ->
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         |${dsumSql("l_quantity")} AS total_qty
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderkey IN (
         |  SELECT l_orderkey FROM lineitem
         |  GROUP BY l_orderkey HAVING ${dsumSql("l_quantity")} > 150)
         |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         |ORDER BY o_totalprice DESC, o_orderkey
         |LIMIT 100""".stripMargin,

    "q58_percentiles" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
        |min(l_extendedprice) AS p0,
        |max(l_extendedprice) AS p100
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // The PLAIN join: the salt must be answer-invisible.
    "q119_salted_join" ->
      s"""SELECT c_mktsegment, ${dsumSql("o_totalprice")} AS revenue,
         |       count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // The PLAIN window: salted partials + broadcast-back must equal
    // sum() OVER (PARTITION BY source) exactly (integer addition).
    // Shared by q120 (byte-gated broadcast) and q120b (forced
    // SHUFFLE_HASH fallback) — the gate cannot change answers.
    "q120_salted_window" -> saltedWindowOracle,
    "q120b_salted_window_shuffle" -> saltedWindowOracle
  )

  private val saltedWindowOracle: String =
    """SELECT doc_id, source, n_chars,
      |       CAST(sum(n_chars) OVER (PARTITION BY source) AS BIGINT)
      |         AS source_chars,
      |       round(CAST(n_chars AS DOUBLE)
      |             / sum(n_chars) OVER (PARTITION BY source)
      |             * 1000000.0) / 1000000.0 AS share
      |FROM documents ORDER BY doc_id""".stripMargin
}
