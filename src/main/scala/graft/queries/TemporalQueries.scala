package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.operators.Temporal

/**
 * Temporal joins — deliberate superset of the reference, which has no
 * sort-merge, range, as-of, or interval join (SURVEY §2.3; the reference
 * planner rejects non-equi conditions outside theta-join filters). Both
 * are staples of event/feature pipelines — point-in-time attribution and
 * time-window correlation — and both are implemented in graft.operators.
 * Temporal as equi-shuffle compositions (union+window, bucket-explode)
 * rather than the quadratic non-equi plans Spark would pick naively.
 *
 * Oracles state the NAIVE declarative form (correlated top-1 join /
 * BETWEEN theta join) — DuckDB's IEJoin executes them fine at oracle
 * scale; the Spark side must reproduce those semantics exactly from its
 * scale-safe rewrites, boundary rules and tie-breaks included.
 */
object TemporalQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- As-of join: each purchase event attributed to the same user's
    // most recent view at-or-before it (ties on ts → larger event_id;
    // purchases with no prior view keep nulls). The union+window rewrite:
    // one shuffle on user_id, one sorted pass, no per-key pair blowup.
    "q90_asof_attrib" -> ((s, dir) => {
      val ev = load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      Temporal.asOfJoin(
          purchases, views,
          leftKey = col("user_id"), rightKey = col("user_id"),
          leftTime = col("ts"), rightTime = col("ts"),
          payload = Seq("v_event_id" -> col("event_id"), "v_value" -> col("value")),
          tieBreak = col("event_id"))
        .select(col("event_id"), col("user_id"), col("v_event_id"), col("v_value"))
        .orderBy(col("event_id"))
    }),

    // ---- The SAME as-of semantics through the native plan operator
    // (AsofJoinPlan → AsofJoinStrategy → AsofJoinExec): shares q90's
    // oracle, so the custom physical operator's streaming merge walk is
    // held to the identical tie/boundary contract as the rewrite.
    "q90b_asof_native" -> ((s, dir) => {
      val ev = load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_id").as("v_event_id"), col("value").as("v_value"))
      Temporal.asOfJoinNative(
          purchases, views,
          leftKey = "user_id", rightKey = "user_id",
          leftTime = "ts", rightTime = "ts",
          payload = Seq("v_event_id", "v_value"),
          tieBreak = "event_id")
        .select(col("event_id"), col("user_id"), col("v_event_id"), col("v_value"))
        .orderBy(col("event_id"))
    }),

    // ---- Filter ABOVE the native as-of node: the injected optimizer
    // rule (PushFilterThroughAsof) must commute it below the operator,
    // after which Catalyst's stock pushdown carries it into the parquet
    // scan — at scale that is "filter before the key shuffle", the
    // difference between moving 1/4 of the rows and all of them.
    // AsofRulesSpec pins the plan; this query pins the answer.
    "q90c_asof_filtered" -> ((s, dir) => {
      val ev = load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_id").as("v_event_id"), col("value").as("v_value"))
      Temporal.asOfJoinNative(
          purchases, views,
          leftKey = "user_id", rightKey = "user_id",
          leftTime = "ts", rightTime = "ts",
          payload = Seq("v_event_id", "v_value"),
          tieBreak = "event_id")
        .filter(col("user_id") < 25)
        .select(col("event_id"), col("user_id"), col("v_event_id"), col("v_value"))
        .orderBy(col("event_id"))
    }),

    // ---- Keyless interval join: lineitems shipped within 7 days of ANY
    // order's placement (no join key at all — the naive Spark plan is a
    // BroadcastNestedLoopJoin; the binned rewrite is an equi join on a
    // 7-day time bucket, PlanAuditSpec pins the absence of BNLJ).
    "q91_range_join_binned" -> ((s, dir) => {
      val li = load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      val ords = load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("o_end"))
      Temporal.rangeJoinBinned(
          li, col("l_shipdate"),
          ords, col("o_orderdate"), col("o_end"),
          bucketSeconds = 7L * 86400)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("min_ok"),
          max(col("o_orderkey")).as("max_ok"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q90_asof_attrib" ->
      """SELECT event_id, user_id, v_event_id, v_value FROM (
        |  SELECT p.event_id, p.user_id, v.event_id AS v_event_id, v.value AS v_value,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY v.ts DESC, v.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |    ON v.user_id = p.user_id AND v.ts <= p.ts
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    // q90's oracle verbatim: one correlated-top-1 contract, two plans.
    "q90b_asof_native" ->
      """SELECT event_id, user_id, v_event_id, v_value FROM (
        |  SELECT p.event_id, p.user_id, v.event_id AS v_event_id, v.value AS v_value,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY v.ts DESC, v.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |    ON v.user_id = p.user_id AND v.ts <= p.ts
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    // q90's contract restricted to user_id < 25 — the filter the
    // optimizer rule pushes below the operator must not change WHAT is
    // computed, only WHERE it runs.
    "q90c_asof_filtered" ->
      """SELECT event_id, user_id, v_event_id, v_value FROM (
        |  SELECT p.event_id, p.user_id, v.event_id AS v_event_id, v.value AS v_value,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY v.ts DESC, v.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id < 25) p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |    ON v.user_id = p.user_id AND v.ts <= p.ts
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q91_range_join_binned" ->
      """SELECT l.l_orderkey, l.l_linenumber,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       min(o.o_orderkey) AS min_ok, max(o.o_orderkey) AS max_ok
        |FROM lineitem l JOIN orders o
        |  ON l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        |GROUP BY l.l_orderkey, l.l_linenumber
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin
  )
}
