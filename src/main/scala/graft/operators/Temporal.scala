package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal joins the reference engine does not have (SURVEY §2.3: "No
 * sort-merge, range, as-of, or interval join exists in the reference") and
 * vanilla Spark SQL cannot express without a plan-killing non-equi join —
 * re-expressed here as compositions of equi-shuffles and sorted window
 * passes, the shapes that survive a 1000-executor cluster:
 *
 *  - [[asOfJoin]]: point-in-time lookup (each left row picks the latest
 *    right row at-or-before its timestamp). The naive formulation is a
 *    non-equi theta join (quadratic per key) topped by an argmax; this one
 *    is a UNION + one hash shuffle on the key + one sorted window pass —
 *    identical cost profile to a sort-merge join, zero pair explosion.
 *    The standard trick in every time-series store built on a shuffle
 *    engine (e.g. the union-asof in Flink/QuestDB discussions; Spark has
 *    no built-in).
 *
 *  - [[rangeJoinBinned]]: interval join (left timestamp falls in a right
 *    [lo, hi) window) with NO equi key. Spark plans the naive version as
 *    BroadcastNestedLoopJoin — O(|L|·|R|) and a single-node broadcast of a
 *    possibly-huge side. Binning quantizes time into fixed buckets,
 *    explodes each right interval onto the (few) buckets it covers, and
 *    joins on the bucket as an equi key; the exact predicate remains as a
 *    residual filter. Pair work collapses from |L|·|R| to Σ per-bucket
 *    products — the classic "bin the range join" rewrite used by
 *    range-join-hinted engines (Databricks' range-join hint implements the
 *    same idea inside the planner).
 */
object Temporal {

  /**
   * As-of join: for every `left` row, attach the payload of the single
   * `right` row with the greatest `rightTime` at-or-before (`inclusive`)
   * or strictly-before (`!inclusive`) the row's `leftTime`, matching on
   * the equi key. Left rows with no qualifying right row keep null
   * payload fields (left-outer semantics; no left rows are dropped or
   * duplicated).
   *
   * Mechanics: both sides are tagged and unioned — right rows carry the
   * payload struct, left rows carry their full row — then ONE window pass
   * partitioned by key and ordered by (time, side, tieBreak) runs
   * `last(payload, ignoreNulls)` over the growing frame: each left row
   * reads the most recent payload emitted above it. Side ordering encodes
   * the boundary rule (inclusive → right sorts before left at equal
   * time). Cost: one hash shuffle + one sort per side — no pair blowup
   * for hot keys, unlike the non-equi-join formulation.
   *
   * `tieBreak` must be unique per (key, rightTime) group on the right
   * side (e.g. the right row's primary key): equal-time right rows are
   * ordered by it ascending, so the LARGEST tieBreak wins — deterministic
   * regardless of partitioning.
   *
   * `payload` maps output column names to right-side expressions. Output
   * = all `left` columns + payload columns, in that order. Left column
   * names must not collide with payload names; `_k/_t/_tb/_side/_rp` are
   * reserved tags.
   */
  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTime: Column, rightTime: Column,
               payload: Seq[(String, Column)],
               tieBreak: Column,
               inclusive: Boolean = true): DataFrame = {
    require(payload.nonEmpty, "asOfJoin needs at least one payload column")
    val (rSide, lSide) = if (inclusive) (0, 1) else (1, 0)
    val lTagged = left.select(
      left.columns.map(col) ++ Seq(
        leftKey.as("_k"), leftTime.as("_t"),
        lit(null).cast("long").as("_tb"), lit(lSide).as("_side")): _*)
    val rTagged = right.select(
      rightKey.as("_k"), rightTime.as("_t"),
      tieBreak.cast("long").as("_tb"), lit(rSide).as("_side"),
      struct(payload.map { case (n, c) => c.as(n) }: _*).as("_rp"))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols = left.columns.map(col) ++
      payload.map { case (n, _) => col("_carry").getField(n).as(n) }
    unioned
      .withColumn("_carry", last(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === lSide)
      .select(outCols: _*)
  }

  /**
   * [[asOfJoin]]'s semantics through the NATIVE plan operator
   * (graft.plans.AsofJoinPlan → AsofJoinStrategy → AsofJoinExec, the
   * full SparkSessionExtensions ladder): each left row picks the right
   * row with the greatest (rightTime, tieBreak) at-or-before
   * (`inclusive`) its leftTime, equi-matched on the key; left-outer.
   * Same oracle as the union+window rewrite (q90/q90b), different plan:
   * two key exchanges + two sorts + ONE streaming merge walk — no
   * unioned relation, no window buffer, left+right never concatenated.
   *
   * `payload` names right-side COLUMNS to carry (the physical operator
   * streams attributes, not expressions — project beforehand for
   * computed payloads). The right side is re-aliased first so a shared
   * lineage with `left` (e.g. two filters of one table) cannot produce
   * duplicate attribute ids in the custom node, which bypasses the
   * analyzer's DeduplicateRelations.
   */
  def asOfJoinNative(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTime: String, rightTime: String,
                     payload: Seq[String], tieBreak: String,
                     inclusive: Boolean = true): DataFrame = {
    val badNames = payload.toSet.intersect(left.columns.toSet)
    require(badNames.isEmpty, s"payload collides with left columns: $badNames")
    // fresh exprIds on the right via aliasing every column
    val r = right.select(right.columns.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output.map(_.name)}"))
    val node = graft.plans.AsofJoinPlan(
      lPlan, rPlan,
      Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      attr(rPlan, tieBreak),
      payload.map(attr(rPlan, _)), inclusive)
    org.apache.spark.sql.GraftPlanBridge.ofRows(left.sparkSession, node)
  }

  /**
   * Interval (range) join with no equi key: all (left, right) pairs with
   * `leftTime` in the half-open window [`rightLo`, `rightHi`). Output =
   * left columns + right columns (names must be disjoint).
   *
   * Both sides get a bucket = floor(epochSeconds / bucketSeconds); each
   * right interval explodes onto every bucket it covers (an interval of
   * width W covers at most ceil(W/bucketSeconds)+1 buckets — pick
   * `bucketSeconds` ≈ the typical window width so this stays ≤2). The
   * join is then an EQUI join on the bucket with the exact range
   * predicate as a residual — Catalyst plans SortMergeJoin/ShuffledHash,
   * never BroadcastNestedLoopJoin (PlanAuditSpec pins this on q91).
   *
   * Bounds must be whole-second timestamps (interval endpoints from date
   * arithmetic are); `leftTime` may carry sub-second precision — bucket
   * assignment floors it, the residual predicate compares full values.
   */
  def rangeJoinBinned(left: DataFrame, leftTime: Column,
                      right: DataFrame, rightLo: Column, rightHi: Column,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    val lb = left.withColumn("_lb", floor(unix_timestamp(leftTime) / bucketSeconds))
    val rb = right.withColumn("_rb", explode(sequence(
      floor(unix_timestamp(rightLo) / bucketSeconds),
      floor((unix_timestamp(rightHi) - 1) / bucketSeconds))))
    lb.join(rb,
        col("_lb") === col("_rb") && leftTime >= rightLo && leftTime < rightHi)
      .drop("_lb", "_rb")
  }

  /** Time-decayed engagement scores: per key, Σ value · 2^(−steps)
    * where steps = elapsed-days div halfLifeDays at the corpus's own
    * reference instant (max event date — computed in a 1-row aggregate,
    * broadcast back; no driver pull). The recency-weighted activity
    * feature every ranking/freshness pipeline keeps.
    *
    * Exactness doctrine: decay runs in INTEGER half-life steps so the
    * weight is an exact power of two built as 1.0 / (1 << steps) —
    * never float `pow`, whose 1-ulp license lets engines disagree.
    * Each value·weight product is one exactly-rounded IEEE multiply
    * (identical cross-engine), and the sum goes through Tables.dsum's
    * DECIMAL image, so the oracle hash-matches bit-for-bit. Steps clamp
    * at 62 (beyond that the weight is 0 at any realistic precision and
    * the shift would overflow).
    *
    * NULL-ts edge semantics (deliberate, cross-engine-consistent): a row
    * with NULL ts yields NULL datediff, and least(NULL, 62) = 62 in BOTH
    * Spark and DuckDB (least ignores NULL operands) — so the row decays
    * to weight 2^-62 ≈ 0 yet still increments n_events. That matches the
    * "unknown timestamp = infinitely old" reading; callers who want such
    * rows excluded entirely filter ts.isNotNull first. */
  def decayedSum(events: DataFrame, key: Column, ts: Column, value: Column,
                 halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, "halfLifeDays must be >= 1")
    val ref = events.agg(max(to_date(ts)).as("_ref"))
    val steps = least(
      (datediff(col("_ref"), to_date(ts)) / halfLifeDays).cast("long"),
      lit(62L))
    events
      .crossJoin(broadcast(ref))
      .withColumn("_w", lit(1.0) /
        call_function("shiftleft", lit(1L), steps.cast("int")))
      .groupBy(key.as("k"))
      .agg(graft.Tables.dsum(value * col("_w")).as("decayed_value"),
        count(lit(1)).as("n_events"))
  }

  /** Event-TRANSITION matrix: per (from_type → to_type) adjacent pair in
    * each user's time-ordered stream, the count and the conditional
    * probability P(to | from) — the Markov-chain statistic behind
    * next-event training data, funnel diagnostics, and bot detection
    * (bots walk improbable transitions). The last event of each user has
    * no successor and contributes nothing.
    *
    * Plan: one lead() window per user (bounded state — a user's events,
    * sorted; external sort spills), then a map-side-combinable pair
    * count. P(to|from) derives from the pair counts themselves (sum per
    * from-side via a second tiny aggregate joined back — type-count²
    * rows, NOT a window over the corpus). Tie order within a timestamp
    * is pinned by (ts, tieBreak) so both engines walk the same sequence. */
  def eventTransitions(events: DataFrame, user: Column, ts: Column,
                       typ: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(user).orderBy(ts, tieBreak)
    val pairs = events
      .withColumn("_next", lead(typ, 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(typ.as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(fromTotals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        graft.Tables.r6(col("n").cast("double") / col("n_from").cast("double"))
          .as("p"))
  }

  /** Per-group OLS TREND SLOPE of a micro-quantized y over an integer x
    * (e.g. quality over crawl day): slope = (n·Σxy − Σx·Σy) /
    * (n·Σx² − (Σx)²), every sum an order-free DECIMAL(38,0) over integer
    * inputs, ONE rounded double divide at the end (the kappa/bm25
    * rational doctrine). The drift monitor a corpus-refresh pipeline
    * alarms on; four 16-byte aggregation cells per group, map-side
    * combinable at any scale. y is quantized by the CALLER (pass micro
    * units; the slope comes back in micro-y per x unit — divide by 1e6
    * at the call site if raw units are wanted). Groups whose x never
    * varies have a zero denominator → NULL slope (undefined trend). */
  def trendSlope(df: DataFrame, group: Column, x: Column, y: Column)
    : DataFrame = {
    val dec = "decimal(38,0)"
    val xl = x.cast("long")
    val yl = y.cast("long")
    // multiply IN decimal (cast one factor first): an xl*yl LONG product
    // wraps past 2^63 silently with ANSI off — epoch-scale x times
    // micro-unit y is exactly that magnitude — which would contradict the
    // order-free DECIMAL exactness this operator promises
    df.groupBy(group.as("g"))
      .agg(count(lit(1)).as("n"),
        sum(xl.cast(dec)).as("sx"),
        sum(yl.cast(dec)).as("sy"),
        sum(xl.cast(dec) * yl).as("sxy"),
        sum(xl.cast(dec) * xl).as("sxx"))
      .select(col("g"), col("n"),
        {
          val num = col("n").cast(dec) * col("sxy") - col("sx") * col("sy")
          val den = col("n").cast(dec) * col("sxx") - col("sx") * col("sx")
          graft.Tables.r6(when(den === 0, lit(null))
            .otherwise(num.cast("double") / den.cast("double"))).as("slope")
        })
  }

  /** ORDERED step funnel over an event stream: for each user, the first
    * time they reach step k STRICTLY AFTER their first reach of step k−1
    * (view → click → purchase); the report is per-step reached-user
    * counts and step-over-step conversion rates — the product-analytics
    * staple next to [[eventTransitions]]'s unordered matrix. Strictly
    * ordered, first-touch semantics: a purchase BEFORE the first view
    * does not count, and later re-reaches never improve a user's time.
    *
    * Plan: step 1 is one groupBy(user) min; each later step is ONE
    * equi-join on user (events filtered to that step's type UPSTREAM of
    * the join — the scan prunes to one type's rows) + one groupBy(user)
    * min. k−1 user-keyed joins total, all AQE-sized; per-user state is
    * k timestamps. The final report aggregates the user-level relation
    * once and `stack`s the 1-row result into k rows — rates are exact
    * long-count rationals, r6'd, nonnegative (no signed-zero exposure).
    * NULL rate for step 1 (no prior step) and 0-denominator steps. */
  def eventFunnel(events: DataFrame, user: Column, ts: Column, typ: Column,
                  steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "eventFunnel needs at least two steps")
    var reach = events.filter(typ === steps.head)
      .groupBy(user.as("u")).agg(min(ts).as("t1"))
    steps.tail.zipWithIndex.foreach { case (s, i) =>
      val k = i + 2
      val cand = events.filter(typ === s)
        .select(user.as("_u"), ts.as("_ts"))
      reach = reach.join(cand,
          col("u") === col("_u") && col("_ts") > col(s"t${k - 1}"), "left")
        .groupBy((col("u") +: (1 until k).map(j => col(s"t$j"))): _*)
        .agg(min(col("_ts")).as(s"t$k"))
    }
    val one = reach.agg(
      count(col("t1")).as("n1"),
      (2 to steps.size).map(k => count(col(s"t$k")).as(s"n$k")): _*)
    val stackArgs = steps.zipWithIndex.flatMap { case (s, i) =>
      Seq(lit(i + 1), lit(s), col(s"n${i + 1}"),
        if (i == 0) lit(null).cast("double")
        else graft.Tables.r6(when(col(s"n$i") === 0, lit(null))
          .otherwise(col(s"n${i + 1}").cast("double") / col(s"n$i").cast("double"))))
    }
    one.select(stackArgs.zipWithIndex.map { case (c, j) => c.as(s"_c$j") }: _*)
      .select(expr(s"stack(${steps.size}, " +
        stackArgs.indices.map(j => s"_c$j").mkString(", ") +
        ") as (step_idx, step, n_users, conv_rate)"))
      .select(col("step_idx"), col("step"), col("n_users"), col("conv_rate"))
  }
}
