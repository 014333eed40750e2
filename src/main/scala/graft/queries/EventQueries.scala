package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{davg, davgSql, dsum, dsumSql, load}
import graft.operators.GraphRank

/**
 * Event/time-series batch analytics over the `events` table: time bucketing,
 * sessionization, funnel-style conditional aggregation, and JSON-ish field
 * extraction. The reference is strictly batch (SURVEY §2.10) — these are the
 * batch analogs of its groupby/window machinery applied to event data; the
 * true streaming path lives in graft.streaming (Structured Streaming
 * superset, not oracle-checkable).
 *
 * props JSON is extracted with a regexp rather than JSON functions so the
 * oracle stays independent of DuckDB's JSON extension.
 */
object EventQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Tumbling-window aggregation (hourly buckets via date_trunc)
    "q38_events_hourly" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(
          date_trunc("hour", col("ts")).as("hour_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .filter(col("hour_start") < lit("2024-01-03 00:00:00").cast("timestamp"))
        .select(
          date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_str"),
          col("event_type"), col("n_events"), col("sum_value"), col("n_users"))
        .orderBy(col("hour_str"), col("event_type"))
    }),

    // ---- Sessionization: 30-minute inactivity gap → new session (lag +
    // running sum of boundaries; the batch analog of stream session windows)
    "q39_events_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val withGap = load(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
      withGap
        .withColumn("session_id", sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(
          max(col("session_id")).as("n_sessions"),
          max(col("n_events")).as("max_session_events"),
          count(lit(1)).as("n_session_rows"))
        .orderBy(col("user_id"))
    }),

    // ---- Conditional (funnel-style) aggregation: per-user behavior profile
    "q40_events_funnel" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_views"),
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_clicks"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchases"),
          dsum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))).as("purchase_value"),
          davg(col("value")).as("avg_value"))
        .filter(col("n_purchases") > 0)
        .orderBy(col("user_id"))
    }),

    // ---- JSON-ish extraction from the props string column
    "q41_events_props" -> ((s, dir) => {
      load(s, dir, "events")
        .select(
          col("event_id"),
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int").as("k_val"))
        .groupBy((col("k_val") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), max(col("k_val")).as("max_k"))
        .orderBy(col("k_bucket"))
    }),

    // ---- Native session_window sessionization (batch execution of the
    // SAME definition the streaming parity spec runs): the oracle is the
    // hand-rolled lag/cumsum islands SQL with session_window's merge rule
    // (a new session starts at ts ≥ prev + gap — the [start, end)
    // convention; q39's islands use strict >, a boundary distinction the
    // oracle spells explicitly). Session bounds compare as exact epoch
    // microseconds — integer, no timestamp-formatting ambiguity.
    "q107_session_window" -> ((s, dir) => {
      graft.streaming.EventStreams.sessionWindowCounts(load(s, dir, "events"))
        .select(col("user_id"),
          unix_micros(col("session_start")).as("session_start_us"),
          unix_micros(col("session_end")).as("session_end_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start_us"))
    }),

    // ---- PageRank over the item-transition graph (the Common Crawl
    // domain-rank pattern): exact scaled-integer arithmetic, 5 synchronous
    // rounds, so the iterative distributed computation is DuckDB-hash-
    // exact — the oracle unrolls the identical recurrence as CTEs.
    "q114_pagerank" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("item"))
      val edges = GraphRank.transitionEdges(ev, "item", "user_id", Seq("ts", "event_id"))
      GraphRank.pageRank(edges, 5)
        .select(col("v").as("item"), col("rank"))
        .orderBy(col("rank").desc, col("item"))
    }),

    // ---- Per-vertex triangle counts over the undirected transition
    // graph (degree-ordered orientation bounds every wedge fan-out by
    // O(√m) — the skew guard a naive neighborhood join lacks).
    "q118_triangles" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("item"))
      val edges = GraphRank.transitionEdges(ev, "item", "user_id", Seq("ts", "event_id"))
      GraphRank.triangleCounts(edges)
        .select(col("v").as("item"), col("n_tri"))
        .orderBy(col("n_tri").desc, col("item"))
    }),

    // ---- Label-propagation communities over the same transition graph
    // (synchronous, weighted-vote, smallest-label tie-break — the
    // deterministic formulation, so 3 unrolled rounds oracle exactly).
    "q124_label_prop" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("item"))
      val edges = GraphRank.transitionEdges(ev, "item", "user_id", Seq("ts", "event_id"))
      GraphRank.labelPropagation(edges, 3)
        .select(col("v").as("item"), col("community"))
        .orderBy(col("item"))
    }),

    // ---- Time-decayed engagement (operators.Temporal.decayedSum):
    // per-user Σ value·2^(−steps), steps = days-since div 2 at the
    // corpus's max date — decay in integer half-life steps so every
    // weight is an exact power of two (never float pow), summed through
    // the DECIMAL image. The recency feature, oracle-exact.
    "q130_decayed_engagement" -> ((s, dir) => {
      graft.operators.Temporal.decayedSum(
          load(s, dir, "events"),
          key = col("user_id"), ts = col("ts"), value = col("value"),
          halfLifeDays = 2)
        .select(col("k").as("user_id"), col("decayed_value"), col("n_events"))
        .orderBy(col("user_id"))
    }),

    // ---- Native JSON flattening: from_json with an explicit schema
    // (codegen'd Jackson parse — the engine path for semi-structured
    // columns; q41's regexp extract is the schemaless fallback), fields
    // promoted to columns and aggregated.
    "q131_json_flatten" -> ((s, dir) => {
      load(s, dir, "events")
        .select(col("event_type"), col("value"),
          from_json(col("props"), lit("k INT")).getField("k").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
          max(col("k")).as("max_k"))
        .orderBy(col("k_bucket"), col("event_type"))
    }),

    // ---- Latest event per user WITHOUT a window: max_by over a
    // lexicographic (ts, event_id) order key — ONE aggregate with
    // map-side partials, so a hot user combines before the exchange
    // where a row_number window would sort its whole partition on one
    // task. The skew-safe argmax-per-group shape.
    "q132_argmax_pergroup" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          max_by(struct(col("event_id"), col("event_type"), col("value")),
            struct(col("ts"), col("event_id"))).as("last"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("last.event_id").as("last_event_id"),
          col("last.event_type").as("last_type"),
          col("last.value").as("last_value"),
          col("n_events"))
        .orderBy(col("user_id"))
    })
  )

  // One label-propagation round as a DuckDB CTE: weighted neighbor-label
  // votes, argmax with the smallest-label tie-break — the identical
  // recurrence labelPropagation's join+agg+window executes.
  private def lpIterSql(k: Int): String =
    s"""l$k AS (
       |  SELECT u AS x, lbl FROM (
       |    SELECT e.u, l.lbl,
       |           row_number() OVER (PARTITION BY e.u
       |                              ORDER BY sum(e.w) DESC, l.lbl) AS rn
       |    FROM und e JOIN l${k - 1} l ON l.x = e.v
       |    GROUP BY e.u, l.lbl)
       |  WHERE rn = 1)""".stripMargin

  // One PageRank round as a DuckDB CTE: the same scaled-integer recurrence
  // pageRank executes — floor division at the contribution and damping
  // steps, vertices with no in-edges land on the (15·base)//100 floor.
  private def prIterSql(k: Int): String =
    s"""r$k AS (
       |  SELECT verts.v,
       |         CAST((15 * (SELECT b FROM base) +
       |               85 * COALESCE(sum((pr.r // o.deg) * e.w), 0)) // 100 AS BIGINT) AS r
       |  FROM verts
       |  LEFT JOIN edges e ON e.dst = verts.v
       |  LEFT JOIN outd o ON o.src = e.src
       |  LEFT JOIN r${k - 1} pr ON pr.v = e.src
       |  GROUP BY verts.v)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q38_events_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_str,
         |event_type, count(*) AS n_events,
         |${dsumSql("value")} AS sum_value,
         |count(DISTINCT user_id) AS n_users
         |FROM events
         |WHERE date_trunc('hour', ts) < TIMESTAMP '2024-01-03 00:00:00'
         |GROUP BY 1, 2 ORDER BY hour_str, event_type""".stripMargin,

    "q39_events_sessionize" ->
      """SELECT user_id,
        |CAST(max(session_id) AS BIGINT) AS n_sessions,
        |max(n_events) AS max_session_events,
        |count(*) AS n_session_rows
        |FROM (
        |  SELECT user_id, session_id, count(*) AS n_events FROM (
        |    SELECT user_id,
        |           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |    FROM (
        |      SELECT user_id, ts, event_id,
        |             CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
        |                  THEN 1 ELSE 0 END AS new_session
        |      FROM (
        |        SELECT user_id, ts, event_id,
        |               lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events)))
        |  GROUP BY user_id, session_id)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q40_events_funnel" ->
      s"""SELECT user_id,
         |CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
         |CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
         |CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
         |${dsumSql("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")} AS purchase_value,
         |${davgSql("value")} AS avg_value
         |FROM events GROUP BY user_id
         |HAVING sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
         |ORDER BY user_id""".stripMargin,

    "q41_events_props" ->
      """SELECT k_bucket, count(*) AS n, max(k_val) AS max_k FROM (
        |  SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) % 10 AS k_bucket,
        |         CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k_val
        |  FROM events)
        |GROUP BY k_bucket ORDER BY k_bucket""".stripMargin,

    // session_window merge rule as islands: new session at ts >= prev+gap
    // (equal-boundary events do NOT merge — [start, end) windows touch
    // without overlapping); end = last event + gap.
    "q107_session_window" ->
      """WITH w AS (
        |  SELECT user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        |f AS (SELECT user_id, ts,
        |             CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL 30 MINUTE
        |                  THEN 1 ELSE 0 END AS ns
        |      FROM w),
        |g AS (SELECT user_id, ts,
        |             sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM f)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
        |       epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q114_pagerank" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id,
         |         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS item
         |  FROM events),
         |seq AS (
         |  SELECT item AS src,
         |         lead(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |  FROM ev),
         |edges AS (SELECT src, dst, count(*) AS w FROM seq
         |          WHERE dst IS NOT NULL AND dst <> src GROUP BY src, dst),
         |outd AS (SELECT src, sum(w) AS deg FROM edges GROUP BY src),
         |verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
         |base AS (SELECT ${GraphRank.Scale} // count(*) AS b FROM verts),
         |r0 AS (SELECT v, (SELECT b FROM base) AS r FROM verts),
         |${(1 to 5).map(prIterSql).mkString(",\n")}
         |SELECT v AS item, r AS rank
         |FROM r5 ORDER BY rank DESC, item""".stripMargin,

    // Same degree-ordered orientation: every triangle counted once as
    // rank(a) < rank(b) < rank(c), then each corner credited.
    "q118_triangles" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id,
         |         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS item
         |  FROM events),
         |seq AS (
         |  SELECT item AS src,
         |         lead(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |  FROM ev),
         |edges AS (SELECT src, dst FROM seq
         |          WHERE dst IS NOT NULL AND dst <> src GROUP BY src, dst),
         |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |        FROM edges),
         |deg AS (SELECT x, count(*) AS d FROM (
         |          SELECT u AS x FROM und UNION ALL SELECT v FROM und) GROUP BY x),
         |o AS (
         |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND und.u < und.v)
         |              THEN und.u ELSE und.v END AS a,
         |         CASE WHEN da.d < db.d OR (da.d = db.d AND und.u < und.v)
         |              THEN und.v ELSE und.u END AS b,
         |         CASE WHEN da.d < db.d OR (da.d = db.d AND und.u < und.v)
         |              THEN db.d ELSE da.d END AS db
         |  FROM und JOIN deg da ON da.x = und.u JOIN deg db ON db.x = und.v),
         |w AS (
         |  SELECT e1.a, e1.b AS b1, e2.b AS b2
         |  FROM o e1 JOIN o e2 ON e1.a = e2.a
         |  WHERE e1.db < e2.db OR (e1.db = e2.db AND e1.b < e2.b)),
         |t AS (
         |  SELECT w.a, w.b1 AS b, w.b2 AS c
         |  FROM w JOIN o e3 ON e3.a = w.b1 AND e3.b = w.b2),
         |pv AS (SELECT v, count(*) AS n_tri FROM (
         |         SELECT a AS v FROM t UNION ALL SELECT b FROM t
         |         UNION ALL SELECT c FROM t) GROUP BY v)
         |SELECT v AS item, n_tri FROM pv ORDER BY n_tri DESC, item""".stripMargin,

    // Three unrolled synchronous LPA rounds over the symmetrized
    // weighted graph; l0 = every vertex its own label.
    "q124_label_prop" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id,
         |         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS item
         |  FROM events),
         |seq AS (
         |  SELECT item AS src,
         |         lead(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |  FROM ev),
         |edges AS (SELECT src, dst, count(*) AS w FROM seq
         |          WHERE dst IS NOT NULL AND dst <> src GROUP BY src, dst),
         |und AS (SELECT u, v, CAST(sum(w) AS BIGINT) AS w FROM (
         |          SELECT src AS u, dst AS v, w FROM edges
         |          UNION ALL SELECT dst, src, w FROM edges)
         |        GROUP BY u, v),
         |l0 AS (SELECT DISTINCT u AS x, u AS lbl FROM und),
         |${(1 to 3).map(lpIterSql).mkString(",\n")}
         |SELECT x AS item, lbl AS community FROM l3 ORDER BY item""".stripMargin,

    // The same exact-power-of-two decay: steps floor-divided, weight
    // 1.0/(1<<steps), product exactly-rounded, DECIMAL-image sum.
    "q130_decayed_engagement" ->
      s"""WITH r AS (SELECT max(CAST(ts AS DATE)) AS ref FROM events)
         |SELECT user_id,
         |       ${dsumSql("value * (1.0 / CAST(1::BIGINT << CAST(least(" +
           "date_diff('day', CAST(ts AS DATE), (SELECT ref FROM r)) // 2, 62) " +
           "AS INT) AS DOUBLE))")} AS decayed_value,
         |       count(*) AS n_events
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q131_json_flatten" ->
      s"""SELECT CAST(json_extract(props, '$$.k') AS INT) % 10 AS k_bucket,
         |       event_type, count(*) AS n,
         |       ${dsumSql("value")} AS sum_value,
         |       max(CAST(json_extract(props, '$$.k') AS INT)) AS max_k
         |FROM events GROUP BY k_bucket, event_type
         |ORDER BY k_bucket, event_type""".stripMargin,

    // The window formulation IS the oracle — the aggregate must agree
    // with rn=1 under the same total (ts, event_id) order.
    "q132_argmax_pergroup" ->
      """SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_type, value AS last_value, n_events
        |FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn,
        |         count(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin
  )
}
