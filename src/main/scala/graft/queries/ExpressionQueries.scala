package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.EngineContext
import graft.Tables.{dsum, dsumSql, load, r6, drnd}

/**
 * Scalar function / expression surface from SURVEY.md §2.8 (reference token→op
 * map engine/src/parser/expression_utils.cpp:270-347): CASE, casts, string
 * ops, math ops, date/time extraction, interval arithmetic, conditional
 * functions, IN/BETWEEN/LIKE, plus the SQL-path features (CTE, nested
 * subqueries) that Calcite handled pre-engine in the reference.
 *
 * Numeric notes mirrored in the oracle SQL:
 * - transcendental results are rounded to 6dp (JVM libm vs DuckDB libm can
 *   differ in the last ulp);
 * - CONCAT uses `||` in the oracle: reference CONCAT is null-propagating
 *   (expression_utils.cpp:1590-1622) and so are Spark concat and DuckDB `||`,
 *   but DuckDB concat() skips nulls;
 * - DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all;
 * - DuckDB dayofweek is 0=Sunday (Postgres dow); Spark/Calcite use 1=Sunday,
 *   so the oracle adds 1 (SURVEY §2.8 date note).
 */
object ExpressionQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- CASE WHEN (reference MAGIC_IF_NOT lowering) + casts (§2.8 casts)
    "q21_case_cast" -> ((s, dir) => {
      load(s, dir, "orders")
        .filter(col("o_orderkey") < 3000)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 150000, "mid")
            .otherwise("low").as("price_band"),
          col("o_totalprice").cast("int").as("price_int"),
          col("o_totalprice").cast("bigint").as("price_long"),
          col("o_orderkey").cast("double").as("key_dbl"),
          col("o_orderkey").cast("string").as("key_str"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- String functions (LogicalProject.cpp:112-599 set)
    "q22_string_funcs" -> ((s, dir) => {
      load(s, dir, "customer")
        .filter(col("c_custkey") < 300)
        .select(
          col("c_custkey"),
          length(col("c_name")).as("name_len"),
          upper(col("c_mktsegment")).as("seg_upper"),
          lower(col("c_mktsegment")).as("seg_lower"),
          reverse(col("c_mktsegment")).as("seg_rev"),
          substring(col("c_name"), 10, 8).as("name_digits"),
          concat(col("c_mktsegment"), lit("_"), col("c_name")).as("seg_name"),
          regexp_replace(col("c_name"), "0", "#").as("name_masked"),
          trim(lit("  pad  ")).as("trimmed"),
          ltrim(lit("  pad  ")).as("ltrimmed"),
          rtrim(lit("  pad  ")).as("rtrimmed"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_translated"),
          col("c_name").like("%00001%").as("like_hit"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("key_padded"),
          initcap(lower(col("c_mktsegment"))).as("seg_title"),
          // SUBSTRING with column start/len (reference LogicalProject.cpp:212-307)
          col("c_name").substr((col("c_custkey") % 3 + 1).cast("int"), lit(5)).as("name_dyn"))
        .orderBy(col("c_custkey"))
    }),

    // ---- Math functions (expression_utils token set: ABS/FLOOR/CEIL/ROUND/
    // MOD/POWER/SQRT/LN/LOG10 + trig; transcendentals rounded for x-engine
    // bit-stability)
    "q23_math_funcs" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 600)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") * lit(-1.0)).as("abs_qty"),
          floor(col("l_extendedprice")).as("floor_price"),
          ceil(col("l_extendedprice")).as("ceil_price"),
          (col("l_orderkey") % 7).as("mod_key"),
          r6(sqrt(col("l_extendedprice"))).as("sqrt_price"),
          r6(pow(col("l_quantity"), 2.0)).as("qty_sq"),
          r6(log(col("l_extendedprice"))).as("ln_price"),
          r6(log10(col("l_extendedprice"))).as("log10_price"),
          r6(sin(col("l_quantity"))).as("sin_qty"),
          r6(cos(col("l_quantity"))).as("cos_qty"),
          r6(atan(col("l_discount"))).as("atan_disc"),
          greatest(col("l_quantity"), col("l_tax") * 100).as("greatest_demo"),
          least(col("l_quantity"), col("l_discount") * 100).as("least_demo"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- Date/time extraction (§2.8: EXTRACT + named forms; DOW 1=Sunday)
    "q24_datetime_funcs" -> ((s, dir) => {
      load(s, dir, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofweek(col("o_orderdate")).as("dow"),
          quarter(col("o_orderdate")).as("qtr"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_str"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          // TO_DATE / TO_TIMESTAMP with format (reference :339-340)
          date_format(to_date(date_format(col("o_orderdate"), "yyyy/MM/dd"), "yyyy/MM/dd"), "yyyy-MM-dd").as("date_rt"),
          date_format(to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
            "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd").as("ts_rt"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- Interval arithmetic + date diff (reference timestamp ± INTERVAL,
    // TIMESTAMPADD/TIMESTAMPDIFF suites)
    "q25_interval_arith" -> ((s, dir) => {
      load(s, dir, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate") + expr("INTERVAL 90 DAYS"), "yyyy-MM-dd").as("plus_90d"),
          date_format(col("o_orderdate") - expr("INTERVAL 2 MONTHS"), "yyyy-MM-dd").as("minus_2mo"),
          date_format(col("o_orderdate") + expr("INTERVAL 1 YEAR"), "yyyy-MM-dd").as("plus_1y"),
          datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_1999"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("add3mo"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- COALESCE / NULLIF / NVL-style conditionals (reference lowers all
    // to CASE; conditional/FUNC_*.rst)
    "q26_coalesce_nullif" -> ((s, dir) => {
      load(s, dir, "customer")
        .select(
          col("c_custkey"),
          nullif(col("c_nationkey") % 4, lit(2)).as("grp"),
          coalesce(nullif(col("c_nationkey") % 4, lit(2)), lit(-1)).as("grp_filled"),
          when(nullif(col("c_acctbal"), lit(0.0)).isNull, "zero")
            .otherwise("nonzero").as("bal_class"),
          (nullif(col("c_nationkey") % 4, lit(2)).isNull).as("is_masked"))
        .orderBy(col("c_custkey"))
    }),

    // ---- IN / BETWEEN / LIKE predicate trio (docs operators/OPS_IN.rst;
    // Calcite expands IN→OR chain, BETWEEN→range — Catalyst does the same).
    // Every predicate MATCHES test data (testdata p_name contains 'widget',
    // not TPC-H part names) — the previous '%part%' pattern made the gate
    // a vacuous 0-row match at every scale.
    "q27_in_between_like" -> ((s, dir) => {
      load(s, dir, "part")
        .filter(
          col("p_type").isin("ECONOMY", "SMALL", "STANDARD") &&
          col("p_size").between(5, 25) &&
          col("p_name").like("%widget%"))
        .groupBy(col("p_type"))
        .agg(count(lit(1)).as("n_parts"), sum(col("p_size")).as("sum_size"))
        .orderBy(col("p_type"))
    }),

    // ---- CTE (WITH): reference commonTableExpressions suite — SQL path
    // through EngineContext.sql
    "q28_cte" -> ((s, dir) => {
      val ctx = EngineContext.forDir(s, dir)
      ctx.sql(
        s"""WITH big_orders AS (
           |  SELECT o_orderkey, o_custkey, o_totalprice
           |  FROM orders WHERE o_totalprice > 250000
           |), cust_stats AS (
           |  SELECT o_custkey, count(*) AS n_big, ${dsumSql("o_totalprice")} AS total_big
           |  FROM big_orders GROUP BY o_custkey
           |)
           |SELECT c_mktsegment, count(*) AS n_custs,
           |       ${dsumSql("total_big")} AS seg_total
           |FROM cust_stats JOIN customer ON c_custkey = o_custkey
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment NULLS LAST""".stripMargin)
    }),

    // ---- Nested/correlated subqueries (reference nestedQueries suite):
    // scalar subquery + IN subquery through the SQL path
    "q29_nested_subquery" -> ((s, dir) => {
      val ctx = EngineContext.forDir(s, dir)
      ctx.sql(
        """SELECT o_orderpriority, count(*) AS n_orders
          |FROM orders
          |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
          |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority NULLS LAST""".stripMargin)
    }),

    // ---- Wildcard projection via SQL (reference wildCard suite)
    "q30_wildcard" -> ((s, dir) => {
      val ctx = EngineContext.forDir(s, dir)
      ctx.sql(
        """SELECT * FROM region ORDER BY r_regionkey""".stripMargin)
    }),

    // ---- STDDEV / VAR family. The reference implements these entirely as
    // Calcite's AggregateReduceFunctionsRule rewrite into SUM/COUNT
    // arithmetic (RelationalAlgebraGenerator.java:204); we apply the same
    // reduction by hand over exact decimal sums so the result is
    // bit-stable across engines (plain stddev_samp accumulates doubles in
    // partition order).
    "q54_stats_var_stddev" -> ((s, dir) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val d6 = DecimalType(18, 6)
      // x*x is computed in DOUBLE (same IEEE product both engines) and cast
      // to DECIMAL(28,8) for the exact sum — a decimal×decimal multiply
      // overflows DuckDB's int64 fast path at this magnitude.
      val d28 = DecimalType(28, 8)
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(col("l_extendedprice")).cast(DoubleType).as("n"),
          sum(col("l_extendedprice").cast(d6)).cast(DoubleType).as("sx"),
          sum((col("l_extendedprice") * col("l_extendedprice")).cast(d28))
            .cast(DoubleType).as("sxx"))
        .select(
          col("l_returnflag"),
          drnd((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 4)
            .as("var_samp"),
          drnd((col("sxx") - col("sx") * col("sx") / col("n")) / col("n"), 4).as("var_pop"),
          r6(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)))
            .as("stddev_samp"),
          r6(col("sx") / col("n")).as("mean"))
        .orderBy(col("l_returnflag").asc_nulls_last)
    }),

    // ---- ROLLUP (superset: no grouping sets anywhere in the reference,
    // SURVEY §2.4)
    "q55_rollup" -> ((s, dir) => {
      load(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total"))
        .orderBy(col("status"), col("priority"))
    }),

    // ---- Pivot (superset; oracle via CASE aggregation)
    "q56_pivot" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .select(col("l_returnflag"), col("F").as("qty_f"), col("O").as("qty_o"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- Boolean semantics with nulls: IS TRUE / IS NOT TRUE / IS NOT FALSE
    // (expression_utils.cpp:275-277 — null-safe, unlike plain NOT)
    "q31_bool_nulls" -> ((s, dir) => {
      val flag = nullif(col("c_nationkey") % 3, lit(2)) > 0 // null / true / false
      load(s, dir, "customer")
        .select(
          col("c_custkey"),
          (flag <=> lit(true)).as("is_true"),
          (!(flag <=> lit(true))).as("is_not_true"),
          (!(flag <=> lit(false))).as("is_not_false"),
          flag.isNull.as("flag_null"))
        .orderBy(col("c_custkey"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q21_case_cast" ->
      """SELECT o_orderkey,
        |CASE WHEN o_totalprice > 300000 THEN 'high'
        |     WHEN o_totalprice > 150000 THEN 'mid' ELSE 'low' END AS price_band,
        |CAST(trunc(o_totalprice) AS INT) AS price_int,
        |CAST(trunc(o_totalprice) AS BIGINT) AS price_long,
        |CAST(o_orderkey AS DOUBLE) AS key_dbl,
        |CAST(o_orderkey AS VARCHAR) AS key_str,
        |strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey""".stripMargin,

    "q22_string_funcs" ->
      """SELECT c_custkey,
        |CAST(length(c_name) AS INT) AS name_len,
        |upper(c_mktsegment) AS seg_upper,
        |lower(c_mktsegment) AS seg_lower,
        |reverse(c_mktsegment) AS seg_rev,
        |substr(c_name, 10, 8) AS name_digits,
        |c_mktsegment || '_' || c_name AS seg_name,
        |regexp_replace(c_name, '0', '#', 'g') AS name_masked,
        |trim('  pad  ') AS trimmed,
        |ltrim('  pad  ') AS ltrimmed,
        |rtrim('  pad  ') AS rtrimmed,
        |translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
        |c_name LIKE '%00001%' AS like_hit,
        |lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
        |upper(substr(lower(c_mktsegment),1,1)) || substr(lower(c_mktsegment),2) AS seg_title,
        |substr(c_name, CAST(c_custkey % 3 + 1 AS INT), 5) AS name_dyn
        |FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin,

    "q23_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |abs(l_quantity * -1.0) AS abs_qty,
        |CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |l_orderkey % 7 AS mod_key,
        |round(sqrt(l_extendedprice), 6) AS sqrt_price,
        |round(pow(l_quantity, 2.0), 6) AS qty_sq,
        |round(ln(l_extendedprice), 6) AS ln_price,
        |round(log10(l_extendedprice), 6) AS log10_price,
        |round(sin(l_quantity), 6) + 0.0 AS sin_qty,
        |round(cos(l_quantity), 6) + 0.0 AS cos_qty,
        |round(atan(l_discount), 6) AS atan_disc,
        |greatest(l_quantity, l_tax * 100) AS greatest_demo,
        |least(l_quantity, l_discount * 100) AS least_demo
        |FROM lineitem WHERE l_orderkey < 600
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q24_datetime_funcs" ->
      """SELECT o_orderkey,
        |CAST(year(o_orderdate) AS INT) AS yr,
        |CAST(month(o_orderdate) AS INT) AS mo,
        |CAST(dayofmonth(o_orderdate) AS INT) AS dom,
        |CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |CAST(quarter(o_orderdate) AS INT) AS qtr,
        |strftime(o_orderdate, '%Y-%m-%d') AS date_str,
        |strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |strftime(strptime(strftime(o_orderdate, '%Y/%m/%d'), '%Y/%m/%d'), '%Y-%m-%d') AS date_rt,
        |strftime(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d') AS ts_rt
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,

    "q25_interval_arith" ->
      """SELECT o_orderkey,
        |strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS plus_90d,
        |strftime(o_orderdate - INTERVAL 2 MONTH, '%Y-%m-%d') AS minus_2mo,
        |strftime(o_orderdate + INTERVAL 1 YEAR, '%Y-%m-%d') AS plus_1y,
        |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT) AS days_to_1999,
        |strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS add3mo
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,

    "q26_coalesce_nullif" ->
      """SELECT c_custkey,
        |nullif(c_nationkey % 4, 2) AS grp,
        |coalesce(nullif(c_nationkey % 4, 2), -1) AS grp_filled,
        |CASE WHEN nullif(c_acctbal, 0.0) IS NULL THEN 'zero' ELSE 'nonzero' END AS bal_class,
        |nullif(c_nationkey % 4, 2) IS NULL AS is_masked
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q27_in_between_like" ->
      """SELECT p_type, count(*) AS n_parts, CAST(sum(p_size) AS BIGINT) AS sum_size
        |FROM part
        |WHERE p_type IN ('ECONOMY','SMALL','STANDARD')
        |  AND p_size BETWEEN 5 AND 25
        |  AND p_name LIKE '%widget%'
        |GROUP BY p_type ORDER BY p_type""".stripMargin,

    "q28_cte" ->
      s"""WITH big_orders AS (
         |  SELECT o_orderkey, o_custkey, o_totalprice
         |  FROM orders WHERE o_totalprice > 250000
         |), cust_stats AS (
         |  SELECT o_custkey, count(*) AS n_big, ${dsumSql("o_totalprice")} AS total_big
         |  FROM big_orders GROUP BY o_custkey
         |)
         |SELECT c_mktsegment, count(*) AS n_custs,
         |       ${dsumSql("total_big")} AS seg_total
         |FROM cust_stats JOIN customer ON c_custkey = o_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment NULLS LAST""".stripMargin,

    "q29_nested_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS LAST""".stripMargin,

    "q30_wildcard" ->
      "SELECT * FROM region ORDER BY r_regionkey",

    "q54_stats_var_stddev" ->
      """SELECT l_returnflag,
        |round((sxx - sx*sx/n)/(n - 1), 4) AS var_samp,
        |round((sxx - sx*sx/n)/n, 4) AS var_pop,
        |round(sqrt((sxx - sx*sx/n)/(n - 1)), 6) AS stddev_samp,
        |round(sx/n, 6) AS mean
        |FROM (
        |  SELECT l_returnflag,
        |    CAST(count(l_extendedprice) AS DOUBLE) AS n,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag NULLS LAST""".stripMargin,

    "q55_rollup" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |coalesce(o_orderpriority, 'ALL') AS priority,
         |count(*) AS n_orders, ${dsumSql("o_totalprice")} AS total
         |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,

    "q56_pivot" ->
      s"""SELECT l_returnflag,
         |CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_f,
         |CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_o
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q31_bool_nulls" ->
      """SELECT c_custkey,
        |(nullif(c_nationkey % 3, 2) > 0) IS NOT DISTINCT FROM TRUE AS is_true,
        |NOT ((nullif(c_nationkey % 3, 2) > 0) IS NOT DISTINCT FROM TRUE) AS is_not_true,
        |NOT ((nullif(c_nationkey % 3, 2) > 0) IS NOT DISTINCT FROM FALSE) AS is_not_false,
        |(nullif(c_nationkey % 3, 2) > 0) IS NULL AS flag_null
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
