package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables.{davgSql, dsumSql}

/**
 * The 14 TPC-H shapes not yet covered by the original q01/q03/q04/q57/
 * q59/q60/q64/q65 gates (TPC-H 1, 3, 13, 5, 6, 14, 10, 18) — together
 * they register the reference's full TPC-H compatibility corpus
 * (tests/BlazingSQLTest/EndToEndTests/TestSuites/TPCHSuite.yaml, 22
 * query shapes) as sign-sensitive driver hash gates instead of the
 * weaker float-parity check (the r9 q154 signed-zero episode proved
 * float-equal ≠ hash-equal).
 *
 * Each gate is ONE SQL text executed by BOTH engines: the Spark side
 * runs it through EngineContext.sql (the reference's bc.sql path —
 * catalog + SQL + Catalyst's subquery/EXISTS rewrites, exactly what the
 * reference exercises through Calcite), and the SAME text is the DuckDB
 * oracle. Shared text makes column names and semantics structurally
 * identical; the only engine-sensitive constructs allowed in it are the
 * repo's cross-engine-deterministic spellings (dsumSql/davgSql DECIMAL
 * aggregates, round(x*1e6)/1e6 — the drnd doctrine).
 *
 * FIXTURE ADAPTATIONS (the driver's TPC-H-ish tables are narrower than
 * dbgen's): columns absent from the fixture are substituted with
 * same-shaped predicates on existing columns, preserving each query's
 * OPERATOR composition — the thing the gate is evidence for:
 *  - partsupp does not exist → a DETERMINISTIC partsupp is derived in a
 *    CTE (dbgen's 4-suppliers-per-part topology; integer-arithmetic
 *    availqty/supplycost) identically in both engines, so Q2/Q9/Q11/
 *    Q16/Q20 exercise their real join/subquery shapes on it.
 *  - l_commitdate/l_receiptdate ("late line") → l_tax > l_discount, a
 *    same-row column comparison (Q4's EXISTS, Q21's EXISTS/NOT-EXISTS
 *    pair keep their multi-correlation structure).
 *  - l_shipmode/p_container/p_mfgr/c_phone/addresses → filters on
 *    l_returnflag / p_size / p_brand / c_nationkey with the same
 *    selectivity role (Q12's CASE-sum classes, Q16/Q19's bracket
 *    predicates, Q22's country-code prefix becomes the nation key).
 *  - date constants sit inside the fixture's 1995-2001 span.
 */
object TpchQueries extends QueryPack {

  /** Deterministic PARTSUPP: dbgen's topology (4 suppliers per part,
    * wrapped around the supplier table) with integer-arithmetic
    * attributes — ps_supplycost is an exact integer/100.0, so min()/
    * equality/products are bit-identical cross-engine. The supplier
    * count is read with a scalar CROSS JOIN (no hardcoded SF). */
  private val partsuppCte: String =
    """WITH sgen AS (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
      |scount AS (SELECT count(*) AS s_n FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |         ((p_partkey + i * 7) % s_n) + 1 AS ps_suppkey,
      |         CAST(((p_partkey * 7 + i * 11) % 9999) + 1 AS BIGINT) AS ps_availqty,
      |         CAST((p_partkey * 13 + i * 101) % 100000 AS DOUBLE) / 100.0 AS ps_supplycost
      |  FROM part CROSS JOIN scount CROSS JOIN sgen)""".stripMargin

  private def r6Sql(e: String): String = s"round(($e) * 1000000.0) / 1000000.0"

  private val sqls: Map[String, String] = Map(

    // ---- TPC-H Q2: min-cost supplier per part in a region — 5-way join
    // with a CORRELATED scalar-min subquery over the same join
    // (TPCHSuite.yaml TEST_02).
    "q_tpch_02" -> (partsuppCte + "\n" +
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_type
        |FROM part
        |JOIN partsupp ON p_partkey = ps_partkey
        |JOIN supplier ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size <= 5 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT min(psq.ps_supplycost)
        |    FROM partsupp psq
        |    JOIN supplier sq ON sq.s_suppkey = psq.ps_suppkey
        |    JOIN nation nq ON sq.s_nationkey = nq.n_nationkey
        |    JOIN region rq ON nq.n_regionkey = rq.r_regionkey
        |    WHERE psq.ps_partkey = p_partkey AND rq.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin),

    // ---- TPC-H Q4: order-priority checking — EXISTS over a same-row
    // line comparison (the commitdate<receiptdate "late line" becomes
    // l_tax > l_discount), rewritten to a semi join (TEST_04).
    "q_tpch_04" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_tax > l_discount)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // ---- TPC-H Q7: volume shipping between two nations — 6-way join
    // with the nation-pair disjunction and a year extraction (TEST_07).
    "q_tpch_07" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |${dsumSql("volume")} AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |         CAST(year(l_shipdate) AS INT) AS l_year,
         |         l_extendedprice * (1.0 - l_discount) AS volume
         |  FROM supplier
         |  JOIN lineitem ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
         |                       AND TIMESTAMP '1997-12-31 00:00:00'
         |) shipping
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    // ---- TPC-H Q8: national market share — 8-way join; the share is a
    // conditional-sum / total-sum ratio per order year (TEST_08).
    "q_tpch_08" ->
      s"""SELECT o_year,
         |${r6Sql(dsumSql("CASE WHEN nation = 'NATION_6' THEN volume ELSE 0.0 END") +
           " / " + dsumSql("volume"))} AS mkt_share
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |         l_extendedprice * (1.0 - l_discount) AS volume,
         |         n2.n_name AS nation
         |  FROM part
         |  JOIN lineitem ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
         |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
         |                        AND TIMESTAMP '1997-12-31 00:00:00'
         |) all_nations
         |GROUP BY o_year
         |ORDER BY o_year""".stripMargin,

    // ---- TPC-H Q9: product-type profit — the derived partsupp joined
    // on BOTH lineitem keys; profit mixes revenue minus supply cost
    // (TEST_09).
    "q_tpch_09" -> (partsuppCte + "\n" +
      s"""SELECT nation, o_year, ${dsumSql("amount")} AS sum_profit
         |FROM (
         |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         |         l_extendedprice * (1.0 - l_discount)
         |           - ps_supplycost * l_quantity AS amount
         |  FROM part
         |  JOIN lineitem ON p_partkey = l_partkey
         |  JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%red%'
         |) profit
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin),

    // ---- TPC-H Q11: important stock — grouped value with a HAVING
    // against a scalar fraction-of-total subquery (TEST_11; commented
    // out in the reference suite for a Drill issue, the SHAPE is still
    // its contract).
    "q_tpch_11" -> (partsuppCte + "\n" +
      s"""SELECT ps_partkey, ${dsumSql("ps_supplycost * ps_availqty")} AS part_value
         |FROM partsupp
         |JOIN supplier ON ps_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_3'
         |GROUP BY ps_partkey
         |HAVING ${dsumSql("ps_supplycost * ps_availqty")} > (
         |  SELECT ${dsumSql("ps_supplycost * ps_availqty")} * 0.001
         |  FROM partsupp
         |  JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3')
         |ORDER BY part_value DESC, ps_partkey""".stripMargin),

    // ---- TPC-H Q12: shipping classes — join + the two-column CASE-sum
    // pivot on order priority (shipmode becomes returnflag) (TEST_12).
    "q_tpch_12" ->
      """SELECT l_returnflag AS ship_class,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag IN ('A', 'R')
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // ---- TPC-H Q15: top supplier — the revenue CTE read twice (join +
    // scalar max), the view-based shape (TEST_15). dsum makes the
    // max-equality exact cross-engine.
    "q_tpch_15" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |         ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier
         |JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,

    // ---- TPC-H Q16: parts/supplier relationship — NOT-IN anti join +
    // count(DISTINCT) over bracket predicates (TEST_16; the supplier
    // comment filter becomes an acctbal threshold).
    "q_tpch_16" -> (partsuppCte + "\n" +
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp
        |JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                         WHERE s_acctbal < 500.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),

    // ---- TPC-H Q17: small-quantity-order revenue — correlated scalar
    // avg against the same table (TEST_17); davg keeps the threshold
    // bit-identical cross-engine.
    "q_tpch_17" ->
      s"""SELECT ${r6Sql(dsumSql("l_extendedprice") + " / 7.0")} AS avg_yearly
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey
         |WHERE p_brand = 'Brand#23' AND p_size <= 5
         |  AND l_quantity < (SELECT 0.2 * ${davgSql("lq.l_quantity")}
         |                    FROM lineitem lq WHERE lq.l_partkey = p_partkey)""".stripMargin,

    // ---- TPC-H Q19: discounted revenue — the three-bracket OR of ANDs
    // over join columns, each bracket a (brand, size-range, qty-range)
    // conjunction (container/shipmode become size/returnflag) (TEST_19).
    "q_tpch_19" ->
      s"""SELECT ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |       count(*) AS n_lines
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11 AND l_returnflag = 'N')
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'N')
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    // ---- TPC-H Q20: potential part promotion — nested IN subqueries
    // with a two-key correlated half-sum threshold (TEST_20; commented
    // out in the reference suite, the shape is still its contract).
    "q_tpch_20" -> (partsuppCte + "\n" +
      s"""SELECT s_name, s_acctbal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_4'
         |  AND s_suppkey IN (
         |    SELECT ps_suppkey FROM partsupp
         |    WHERE ps_partkey IN (SELECT p_partkey FROM part
         |                         WHERE p_name LIKE 'small%')
         |      AND ps_availqty > (
         |        SELECT 0.5 * ${dsumSql("lq.l_quantity")}
         |        FROM lineitem lq
         |        WHERE lq.l_partkey = ps_partkey AND lq.l_suppkey = ps_suppkey
         |          AND lq.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |          AND lq.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
         |ORDER BY s_name""".stripMargin),

    // ---- TPC-H Q21: suppliers who kept orders waiting — the EXISTS /
    // NOT-EXISTS pair over the same table with <> correlations ("late"
    // is l_tax > l_discount) (TEST_21; commented out in the reference
    // suite, the shape is still its contract).
    "q_tpch_21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_tax > l1.l_discount
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_tax > l3.l_discount)
        |  AND n_name = 'NATION_5'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    // ---- TPC-H Q22: global sales opportunity — country-code filter
    // (the phone prefix becomes the nation key), scalar-avg threshold,
    // NOT EXISTS anti join on recent orders (TEST_22; commented out in
    // the reference suite, the shape is still its contract). The date
    // bound keeps the anti join non-degenerate: at fixture order
    // density every customer has SOME order, as dbgen's 1/3 orderless
    // customers do not exist here.
    "q_tpch_22" ->
      s"""SELECT cntrycode, count(*) AS numcust, ${dsumSql("c_acctbal")} AS totacctbal
         |FROM (
         |  SELECT CAST(c_nationkey AS INT) AS cntrycode, c_acctbal, c_custkey
         |  FROM customer
         |  WHERE c_nationkey IN (3, 8, 13, 18, 23)
         |    AND c_acctbal > (SELECT ${davgSql("c_acctbal")} FROM customer
         |                     WHERE c_acctbal > 0.0
         |                       AND c_nationkey IN (3, 8, 13, 18, 23))
         |) custsale
         |WHERE NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
         |GROUP BY cntrycode
         |ORDER BY cntrycode""".stripMargin
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sqls.map { case (name, sql) =>
      name -> ((s: SparkSession, dir: String) =>
        graft.EngineContext.forDir(s, dir).sql(sql))
    }

  def oracleSql: Map[String, String] = sqls
}
