package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Distributed generalized suffix array over the corpus TOKEN stream, built
 * by prefix doubling (Manber–Myers 1990), plus exact cross-document
 * repeated-substring detection from adjacent-suffix LCPs — the suffix-array
 * form of the Lee et al. 2022 ExactSubstr signal that
 * [[Dedup.duplicatedSpans]] approximates with positional 8-grams (a
 * duplicated run shorter than the gram width is invisible there; here every
 * repeat length ≥ minLen is exact). The reference has no substring index at
 * all (its dedup surface is row-equality DISTINCT, GroupBy.cpp:205-213);
 * this is part of the beyond-reference curation toolkit.
 *
 * Why prefix doubling and not DC3: doubling is O(log maxDocLen) rounds of
 * {one equi-join + one dense-rank pass}, every round shuffling exactly the
 * position table on narrow integer keys — the shape that survives a
 * 1000-executor corpus. DC3's recursion would serialize on a driver-side
 * subproblem.
 *
 * Dense ranking WITHOUT a global window: a partition-less
 * `dense_rank().over(orderBy(...))` collapses to one task — the exact
 * single-point-of-failure the 100 TB rubric names. Instead
 * [[rangeDenseRank]] range-repartitions on the key (equal keys co-locate by
 * the RangePartitioner contract), sorts within partitions, assigns LOCAL
 * dense ranks in one imperative per-partition pass (the sanctioned
 * mapPartitions case: the declarative alternative — a window keyed by
 * spark_partition_id — would pay one extra full exchange per doubling
 * round), and adds per-partition offsets (one max-rank row per partition —
 * a partition-count-bounded driver pull, the q70 sizing-class pull). Ranks
 * are invariant to the sampled partition boundaries, so the answer is
 * deterministic even though the boundaries are not.
 *
 * Ties are REAL in a generalized SA: two documents can end with the same
 * token sequence, so equal suffixes keep equal dense ranks at every level
 * (a single-string SA never ties; doc-end cuts make it possible here).
 * Adjacency for LCP therefore uses the (rank, doc, pos) total order.
 *
 * Resource lifecycle: per-round rank tables are lineage-truncated
 * (localCheckpoint, or reliable checkpoints under
 * `graft.dedup.reliableCheckpoint` — same knob as Dedup); this is the
 * return-and-forget form — blocks are reclaimed by the ContextCleaner once
 * the result DataFrames become unreachable (the minHashLshPairs doctrine).
 */
object SuffixIndex {

  /** Default [[build]] segment cap: 2^16 tokens. The doubling-round count
    * is ⌈log2 maxDocLen⌉ over the WHOLE corpus position table, so one
    * unread-the-scaladoc 10M-token document used to force ~24 corpus-wide
    * rounds on every caller of the uncapped default (the r10/r11 carryover
    * hazard). 65536 tokens ≈ a 300-page book: repeats inside a segment
    * stay exact, a repeat longer than 65k tokens is reported truncated at
    * the boundary — an acceptance Lee et al. 2022 ship at the same order
    * of magnitude. Pass capTokens = 0 for the uncapped build when the
    * corpus is known-bounded and whole-doc suffix identity matters. */
  val DefaultCapTokens: Int = 1 << 16

  /** Default [[build]] starting width (r16 optimization): round 1 ranks
    * width-32 token SLICES computed row-locally from the split array, so
    * prefix doubling starts at h = 32 instead of h = 1 — the first five
    * doubling rounds (1→2→4→8→16→32), each a corpus-wide {equi-join +
    * range rank} with its own lineage barrier, collapse into one wider
    * round-1 sort key (≤32 short tokens instead of 1). Levels BELOW the
    * start width, which only the LCP walk consumes and only through rank
    * EQUALITY, become lazy row-local slice tables (array equality is
    * rank equality for them — exact, no hashing). Ranks are provably
    * identical: the dense rank of (r_h(p), r_h(p+h)) pairs IS the dense
    * rank of 2h-token prefixes cut at doc/segment end, which is what the
    * slice ranks compute directly (SuffixIndexSpec's brute-force corpora
    * + the q143/q144 oracle gates pin it). Must be a power of two so the
    * level ladder stays {1, 2, 4, …} for the walk's binary
    * decomposition.
    *
    * Sizing the default (measured at sf0.1, paired 2-run captures):
    * q143 13.0→9.1→8.4→7.1→6.6 s and q144 22.2→18.7→16.4→15.5→16.5 s at
    * w = 1(old)/8/16/32/64 — q143 keeps improving with fewer rounds, but
    * past w = 32 the LCP walk's slice-level join payloads (w/2-token
    * arrays vs 8-byte ranks) start costing q144 more than the saved
    * round, so 32 is the balanced default. The trade moves the same way
    * at cluster scale: round-1 exchange bytes grow linearly in w while
    * rounds saved grow only logarithmically — callers with very long
    * shared prefixes (log-structured corpora) can lower it, callers
    * ranking short records can raise it. */
  val DefaultStartWidth: Int = 32

  /** Rank tables from one build: `ranks` = (d, p, r) final suffix ranks
    * (dense; ties = genuinely equal suffixes), `levels` = (h, table) for
    * h = 1, 2, 4, … — level h ranks compare suffix prefixes of length h
    * (cut at doc end) — and `maxLen` the longest document in tokens.
    * Levels BELOW the build's `startWidth` carry the width-h token SLICE
    * as `r` instead of a dense rank (r16): their only consumer is the
    * LCP walk's equality test, and slice equality ⟺ level-rank equality
    * exactly (same doc/segment cut), so they need no corpus-wide rank
    * round — they are lazy row-local projections, not materialized
    * tables.
    *
    * The level tables are lineage-truncated materializations: ⌈log2
    * maxDocLen⌉ corpus-position-sized block sets that live until the
    * ContextCleaner reclaims them (return-and-forget, the
    * minHashLshPairs doctrine). A long-lived session indexing many
    * corpora should `close()` each build once its consumers have
    * materialized — [[Tables.close]] drops every level's blocks
    * deterministically (after which the DataFrames are CONSUMED:
    * re-executing them would re-read unpersisted truncated lineage). */
  final case class Tables(ranks: DataFrame, levels: Seq[(Int, DataFrame)],
                          maxLen: Int, capTokens: Int = 0)
    extends AutoCloseable {
    override def close(): Unit =
      (ranks +: levels.map(_._2)).distinct.foreach { df =>
        df.queryExecution.analyzed.collect {
          case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
        }.foreach(_.unpersist(blocking = false))
      }
  }

  /** Doubling rounds the last build executed (spec hook, the
    * Dedup.lastDistributedRounds pattern). */
  @volatile var lastRounds: Int = 0

  /** Per-level pair-table survivor counts of the last
    * [[crossDocRepeats]] call run with `levelStats = true`:
    * ("start", n) for the adjacent cross-doc pair table, ("prefilter", n)
    * after the minLen rank-equality prefilter, then (h.toString, n) after
    * each level's dead-pair prune. Empty after a levelStats = false call.
    * Diagnostics only (SCALING.md cost attribution), never control
    * flow. */
  @volatile var lastLevelSurvivors: Vector[(String, Long)] = Vector.empty

  /** Dense global rank of `df` by `keys` (ascending, binary string order —
    * identical to DuckDB's), scale-safe per the object doc. Output adds
    * `out` (LongType, 1-based) and drops nothing else. */
  private[operators] def rangeDenseRank(df: DataFrame, keys: Seq[String],
                                        out: String,
                                        pinInput: Boolean = true): DataFrame =
    rangeDenseRankN(df, keys, out, pinInput)._1

  /** [[rangeDenseRank]] plus the number of distinct keys (the last offset
    * cumsum — free observability the doubling loop uses for its
    * all-unique early exit without an extra action).
    *
    * `pinInput = false` (r16): skip the input barrier when the input is
    * CHEAP to execute twice — a row-local projection off a scan (round
    * 1's slice stream) or an already-checkpointed block scan
    * (crossDocRepeats' total-order rank over `Tables.ranks`). For those,
    * the sampling pass re-reads source/blocks instead of paying a full
    * corpus-position block write + read; the doubling loop's successor
    * JOIN keeps the barrier (re-executing a two-exchange join for the
    * sampling pass is the cost the barrier was measured against). */
  private def rangeDenseRankN(df: DataFrame, keys: Seq[String],
                              out: String,
                              pinInput: Boolean = true): (DataFrame, Long) = {
    val spark = df.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // materialize the INPUT before the range exchange: RangePartitioner
    // SAMPLES its input in a separate pass, so an unpinned input (the
    // doubling round's successor join) would execute its shuffle TWICE —
    // once for boundary sampling, once for the real exchange. One
    // checkpoint turns both passes into cached-block reads. Local sf0.1
    // timing is flat (per-job fixed costs dominate 270k-row shuffles);
    // the point is the cluster regime, where this is the difference
    // between one and two corpus shuffles per doubling round. (Dense
    // ranks are range-boundary-invariant, so an unpinned double
    // execution is a pure cost question, never a correctness one.)
    val pinnedIn = if (pinInput) Dedup.truncateLineage(df) else df
    val sorted = pinnedIn.repartitionByRange(p, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
    val schema = df.schema.add("gdr_pid", IntegerType).add("gdr_lr", LongType)
    val keyIdx = keys.map(df.schema.fieldIndex).toArray
    val withLr = spark.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var lr = 0L
        var prev: IndexedSeq[Any] = null
        it.map { r =>
          val k: IndexedSeq[Any] = keyIdx.map(r.get).toIndexedSeq
          if (prev == null || k != prev) { lr += 1; prev = k }
          Row.fromSeq(r.toSeq :+ pid :+ lr)
        }
      }, schema)
    // one materialization read by BOTH consumers (local ranks + offsets), so
    // they cannot see different range boundaries
    val pinned = Dedup.truncateLineage(withLr)
    val offs = pinned.groupBy(col("gdr_pid"))
      .agg(max(col("gdr_lr")).as("nk")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offRows = offs.map { case (pid, nk) =>
      val o = acc; acc += nk; Row(pid, o)
    }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toSeq, 1),
      new org.apache.spark.sql.types.StructType()
        .add("gdr_pid", IntegerType).add("gdr_off", LongType))
    (pinned.join(broadcast(offDf), "gdr_pid")
      .withColumn(out, col("gdr_lr") + col("gdr_off"))
      .drop("gdr_pid", "gdr_lr", "gdr_off"), acc)
  }

  /** (d, ts) split-token arrays, one row per doc; empty text contributes
    * one empty token (split('') = ['']) — the DuckDB string_split
    * convention, kept identical so positions line up cross-engine. The
    * projection barrier matters: every slice consumer below references
    * `ts` as an ATTRIBUTE, so the split runs once per row, not once per
    * lambda element (the q142 HOF-CSE lesson). */
  private def tokenArrays(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).as("d"), split(col(text), " ").as("ts"))

  /** (d, p, sw) width-`w` suffix-prefix slices, p 1-based: sw = the
    * min(w, tokens-to-cut) leading tokens of the suffix at p, cut at
    * min(doc end, containing cap-aligned segment end) — exactly the cut
    * [[build]]'s successor join applies, so the dense rank of `sw` IS
    * the level-w rank table. ROW-LOCAL: one transform + posexplode off
    * the split array; no join, no shuffle, no corpus-wide round. */
  private def sliceStream(arr: DataFrame, w: Int, capTokens: Int): DataFrame = {
    def cut(i: Column): Column =
      if (capTokens > 0)
        least(size(col("ts")), i - (i % capTokens) + capTokens) - i
      else size(col("ts")) - i
    arr.select(col("d"), posexplode(transform(col("ts"), (_, i) =>
        slice(col("ts"), i + 1, least(lit(w), cut(i))))).as(Seq("p0", "sw")))
      .select(col("d"), (col("p0") + 1).as("p"), col("sw"))
  }

  /** Build the index: O(⌈log2 maxDocLen⌉) doubling rounds. Early exit when
    * every rank is unique (all suffixes distinguished).
    *
    * `capTokens` (default [[DefaultCapTokens]] = 2^16; 0 = uncapped)
    * SEGMENTS giant documents: the round count
    * is ⌈log2 maxDocLen⌉ over the WHOLE corpus position table, so one
    * pathological 10M-token document forces ~24 corpus-wide doubling
    * rounds on everyone. With a cap, suffix comparison is cut at the
    * containing cap-aligned segment boundary exactly as it is cut at doc
    * end (the successor join simply requires the successor position to
    * share the segment — no id rewriting, no extra shuffle: `seg` is
    * derived from `p` row-locally), so rounds ≤ ⌈log2 cap⌉ + 1 no matter
    * the longest document. This is the Lee et al. 2022 segmenting
    * practice: a repeat CROSSING a segment boundary is reported truncated
    * at the boundary; repeats wholly inside a segment are exact. Ranks of
    * documents shorter than the cap are IDENTICAL to the uncapped build
    * (every suffix's doc-end cut lands before its segment cut —
    * spec-pinned). */
  def build(docs: DataFrame, id: String, text: String,
            capTokens: Int = DefaultCapTokens,
            startWidth: Int = DefaultStartWidth,
            pinSlices: Boolean = false): Tables = {
    require(capTokens >= 0, "capTokens must be >= 0 (0 = uncapped)")
    require(startWidth >= 1 && (startWidth & (startWidth - 1)) == 0,
      "startWidth must be a power of two (the level ladder is binary)")
    // SCAN-PARALLELISM floor (r17, guide §2.5 input skew): a compact
    // corpus arrives as one splittable unit (sf0.1's documents.parquet is
    // a single 584 KB file → ONE scan task) while the row-local slice
    // passes below explode it ~80× — measured 47.8 MB of round-1 slices
    // written by a single task, and every sub-width slice level replayed
    // the same single-threaded posexplode (~1 s apiece, serial, the bulk
    // of q144's walk tail). Hash-repartition the per-DOC token relation
    // (small rows, cheap exchange) up to the session's parallelism before
    // exploding; on corpora whose scan already carries ≥ that many
    // partitions this is a no-op, so nothing is hard-coded to local mode.
    val arr0 = tokenArrays(docs, id, text)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val arr1 =
      if (arr0.rdd.getNumPartitions < par) arr0.repartition(par, col("d"))
      else arr0
    // pinSlices (r17): the LCP walk consumes every sub-width slice level
    // TWICE (A/B sides) — without a pin that is 2·log2(startWidth)
    // corpus-wide split+posexplode replays. A LAZY barrier materializes
    // the token-array relation with the sizing action below and the walk
    // reads blocks; rank-only consumers (suffixRanks/q143) keep the
    // unpinned form — for them the r16 pinInput=false measurement stands
    // (one extra source replay beats a corpus block write).
    val arr = if (pinSlices) Dedup.truncateLineageLazy(arr1) else arr1
    // 1-row sizing pull (sanctioned): longest doc bounds the rounds; total
    // positions bounds the all-unique early exit. Computed on the per-DOC
    // relation (pre-explode) — one narrow pass.
    val sizing = arr.agg(max(size(col("ts"))),
      sum(size(col("ts")).cast("long"))).collect()(0)
    val n = if (sizing.isNullAt(1)) 0L else sizing.getLong(1)
    if (n == 0L) {
      val empty = arr.select(col("d"), lit(1).as("p"), lit(0L).as("r")).limit(0)
      lastRounds = 0
      return Tables(empty, Seq(1 -> empty), 0, capTokens)
    }
    val maxLen = sizing.getInt(0)
    val effLen = if (capTokens > 0) math.min(maxLen, capTokens) else maxLen
    // Round 1 at width `startWidth` (r16, [[DefaultStartWidth]] scaladoc):
    // rank the row-local width-w slices — the first log2(w) doubling
    // rounds never run. Levels BELOW w exist only for the LCP walk's
    // EQUALITY tests, so they are lazy slice tables (col `r` is the slice
    // array; array equality ⟺ level-rank equality, exactly — identical
    // doc/segment cut, see [[sliceStream]]). pinInput = false: the slice
    // stream is a projection off the scan, so the range sampler's second
    // execution re-reads the source instead of paying a corpus-position
    // block write.
    val w = startWidth
    val (r0, n0) =
      rangeDenseRankN(sliceStream(arr, w, capTokens), Seq("sw"), "r",
        pinInput = false)
    var r = r0.select(col("d"), col("p"), col("r"))
    var nDistinct = n0
    var levels = Vector.empty[(Int, DataFrame)]
    var lh = 1
    while (lh < w) {
      levels = levels :+ (lh ->
        sliceStream(arr, lh, capTokens)
          .select(col("d"), col("p"), col("sw").as("r")))
      lh *= 2
    }
    levels = levels :+ (w -> r)
    var h = w
    var rounds = 1
    while (h < effLen && nDistinct < n) {
      var succ = r.select(col("d"), (col("p") - h).as("p"), col("r").as("rs"))
      if (capTokens > 0)
        // keep only successors inside the target position's segment: a
        // cross-segment successor reads as "suffix ended" (rs -> 0),
        // identical to the doc-end cut
        succ = succ.filter(
          expr(s"(p - 1) div $capTokens") === expr(s"(p - 1 + $h) div $capTokens"))
      val paired = r.join(succ, Seq("d", "p"), "left").na.fill(0L, Seq("rs"))
      val (rNext, nd) = rangeDenseRankN(paired, Seq("r", "rs"), "r2")
      r = rNext.select(col("d"), col("p"), col("r2").as("r"))
      nDistinct = nd
      h *= 2
      rounds += 1
      levels = levels :+ (h -> r)
    }
    lastRounds = rounds
    Tables(r, levels, maxLen, capTokens)
  }

  /** The suffix array itself: (id, pos, srank) — srank is the dense rank of
    * the token suffix starting at pos among ALL corpus suffixes (capped at
    * the segment boundary when `capTokens` > 0, see [[build]]). */
  def suffixRanks(docs: DataFrame, id: String, text: String,
                  capTokens: Int = DefaultCapTokens): DataFrame =
    build(docs, id, text, capTokens).ranks
      .select(col("d").as(id), col("p").cast("long").as("pos"), col("r").as("srank"))

  /** Exact cross-document repeated substrings: for every ADJACENT pair in
    * suffix order whose suffixes come from different documents, the exact
    * LCP in tokens — the longest substring shared at that boundary. The
    * corpus-wide longest cross-doc verbatim substring is the max over these
    * pairs: any block of suffixes sharing a length-L prefix that spans two
    * documents contains an adjacent cross-doc pair inside the block (walk
    * until the doc changes), so adjacency loses nothing.
    *
    * LCP via the level tables (the classic O(log n)-per-pair rank walk,
    * generalized for doc-end ties): descend levels h = 2^K … 1; when both
    * advanced positions exist and their level-h ranks agree, the suffixes
    * agree for min(h, remaining) more tokens — equal level ranks with fewer
    * than h tokens remaining mean BOTH suffixes end there identically (the
    * 0-padded doubling encodes "ended"), so the increment is exact, not an
    * overshoot. Each level is two (doc, pos) equi-joins over the
    * adjacent-pair table: O(n log n) total join rows, the published bound.
    *
    * Returns the top `topK` by (lcp DESC, da, pa, db, pb) with the repeated
    * text materialized, filtered to lcp ≥ minLen.
    *
    * `capTokens` passes through to [[build]]: with a cap, a repeat
    * crossing a segment boundary is reported truncated at the boundary
    * (the remaining-length clamp uses the containing segment's end, not
    * the doc end), and repeats wholly inside a segment stay exact.
    *
    * DEAD-PAIR PRUNING per level: before the level-h joins, drop every
    * pair that can no longer reach minLen. The descend maintains
    * trueLcp − lcp < 2h at that point (if the previous level's ranks had
    * matched, lcp would have grown), so the pair's final lcp is at most
    * lcp + min(2h − 1, remaining tokens) — when that bound is < minLen
    * the pair can never pass the output filter and carrying it through
    * the remaining levels is pure join volume. At the last levels this
    * removes the bulk of the table (most adjacent cross-doc pairs share
    * almost nothing), exactly the tail the r9 plan audit flagged. */
  def crossDocRepeats(docs: DataFrame, id: String, text: String,
                      minLen: Int = 3, topK: Int = 10,
                      capTokens: Int = DefaultCapTokens,
                      levelStats: Boolean = false): DataFrame = {
    val t = build(docs, id, text, capTokens, pinSlices = true)
    val lens = docs.select(col(id).as("d"), size(split(col(text), " ")).as("len"))
    // total order (r, d, p) -> srow; keys are unique so dense rank = row
    // number. pinInput = false (r16): t.ranks is already a checkpointed
    // block scan, so re-pinning it would write a second copy of the
    // corpus-position table just for the range sampler.
    val rn = rangeDenseRank(t.ranks, Seq("r", "d", "p"), "srow", pinInput = false)
    val a = rn.select(col("d").as("da"), col("p").as("pa"), col("srow"))
    val b = rn.select(col("d").as("db"), col("p").as("pb"), (col("srow") - 1).as("srow"))
    def effEnd(len: Column, pos: Column): Column =
      if (capTokens > 0)
        least(len, ((pos - 1).cast("long") / capTokens).cast("long") * capTokens + capTokens)
      else len
    var stats = Vector.empty[(String, Long)]
    def checkpointed(df: DataFrame, label: String): DataFrame =
      if (!levelStats) df
      else {
        // diagnostic mode: materialize each stage so the count is a
        // cached-block read and the next level starts from blocks instead
        // of replaying the walk — linear, not quadratic, in levels
        val pinned = Dedup.truncateLineage(df)
        stats = stats :+ (label -> pinned.count())
        pinned
      }
    var pairs = checkpointed(
      a.join(b, "srow").filter(col("da") =!= col("db")), "start")
    // MINLEN RANK-EQUALITY PREFILTER — the lever the dead-pair prune
    // lacks at early levels: for minLen = 3 the prune (lcp + 2h−1 ≥
    // minLen on lcp = 0) passes EVERYTHING until h = 1, so every
    // adjacent pair rides all the joins. But lcp ≥ minLen forces the
    // suffixes to agree on their first h0 = 2^⌊log2 minLen⌋ ≤ minLen
    // tokens, i.e. EQUAL level-h0 ranks at the START positions (the
    // 0-padded doubling makes identically-ended short suffixes equal
    // too, so doc/segment ends cannot break the implication). One
    // equi-join against the level-h0 table before the walk drops every
    // pair whose first h0 tokens differ, and the walk's O(n log n) join
    // volume becomes O(survivors · log n). Output-identical: the walk
    // itself is untouched, the prefilter only removes pairs the final
    // lcp ≥ minLen filter was guaranteed to remove anyway.
    //
    // MEASURED honesty (levelStats counters, SCALING.md): how much this
    // prunes is a DATA property — adjacent pairs in suffix order share
    // prefixes by construction, so on the 48-word shared-vocab driver
    // corpus only 0.4% of pairs differ in their first 2 tokens (260k of
    // 270k pairs genuinely carry potential lcp ≥ 3 through every level —
    // the walk's residual time is irreducible join volume there, the
    // floor argument). On the 10× Heaps-tail corpus the same prefilter
    // removes 20% (2.17M → 1.73M); organic corpora with real vocabulary
    // growth sit closer to the latter. Cost when it doesn't bite: two
    // cached-level equi-joins, PE-normalized-unmeasurable at sf0.1.
    for ((h0, lev0) <- t.levels.filter(_._1 <= minLen).lastOption) {
      val ga = lev0.select(col("d").as("da"), col("p").as("pa"), col("r").as("g_ra"))
      val gb = lev0.select(col("d").as("db"), col("p").as("pb"), col("r").as("g_rb"))
      pairs = checkpointed(
        pairs.join(ga, Seq("da", "pa"))
          .join(gb, Seq("db", "pb"))
          .filter(col("g_ra") === col("g_rb"))
          .drop("g_ra", "g_rb"), s"prefilter_h$h0")
    }
    pairs = pairs
      .join(lens.select(col("d").as("da"), col("len").as("la")), "da")
      .join(lens.select(col("d").as("db"), col("len").as("lb")), "db")
      .withColumn("ea", effEnd(col("la"), col("pa")))
      .withColumn("eb", effEnd(col("lb"), col("pb")))
      .withColumn("lcp", lit(0L))
    for (((h, lev), i) <- t.levels.reverse.zipWithIndex) {
      val la = lev.select(col("d").as("da"), col("p").as("qa"), col("r").as(s"ra$i"))
      val lb = lev.select(col("d").as("db"), col("p").as("qb"), col("r").as(s"rb$i"))
      val headroom = least(col("ea") - col("pa") + 1,
        col("eb") - col("pb") + 1) - col("lcp")
      pairs = checkpointed(
        pairs.filter(col("lcp") + least(lit(2L * h - 1), headroom) >= minLen),
        s"level_h$h")
        .withColumn("qa", col("pa") + col("lcp"))
        .withColumn("qb", col("pb") + col("lcp"))
        .join(la, Seq("da", "qa"), "left")
        .join(lb, Seq("db", "qb"), "left")
        .withColumn("lcp",
          when(col(s"ra$i").isNotNull && col(s"rb$i").isNotNull &&
               col(s"ra$i") === col(s"rb$i"),
            col("lcp") + least(lit(h.toLong),
              col("ea") - col("pa") + 1 - col("lcp"),
              col("eb") - col("pb") + 1 - col("lcp")))
          .otherwise(col("lcp")))
        .drop("qa", "qb", s"ra$i", s"rb$i")
    }
    lastLevelSurvivors = stats
    val top = pairs.filter(col("lcp") >= minLen)
      .orderBy(col("lcp").desc, col("da"), col("pa"), col("db"), col("pb"))
      .limit(topK)
    // materialize the repeated text from the A-side document (one
    // topK-bounded join against the token-array relation)
    top.join(docs.select(col(id).as("da"), split(col(text), " ").as("ts")), "da")
      .select(col("da"), col("pa").cast("long").as("pa"),
        col("db"), col("pb").cast("long").as("pb"), col("lcp"),
        array_join(slice(col("ts"), col("pa").cast("int"), col("lcp").cast("int")), " ")
          .as("repeat_text"))
      .orderBy(col("lcp").desc, col("da"), col("pa"), col("db"), col("pb"))
  }
}
