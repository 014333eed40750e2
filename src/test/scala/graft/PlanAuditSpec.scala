package graft

import org.scalatest.funsuite.AnyFunSuite

/**
  * Physical-plan audit for the headline queries: these assertions pin the
  * plan SHAPE we designed for 100 TB, so a regression that silently turns
  * a broadcast join into a shuffle, drops a pushed filter, or introduces a
  * cross product fails CI rather than only showing up as a slow bench.
  */
class PlanAuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sfDir).queryExecution.executedPlan.toString

  test("q01: partial+final aggregation with pushed scan filter") {
    val p = plan("q01_tpch_q1")
    assert(p.contains("partial_"), p.take(2000)) // map-side combine
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
  }

  test("q03: both dims broadcast (no shuffle join for small sides)") {
    val p = plan("q03_join3_topk")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q57 tpch q5: broadcast dims, no cartesian products anywhere") {
    val p = plan("q57_tpch_q5")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q59 tpch q6: every predicate reaches the parquet scan") {
    val p = plan("q59_tpch_q6")
    // the PushedFilters list is elided in toString; check the stable prefix
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_shipda"), p.take(2000))
  }

  test("q46 embedding dedup: equi join on probe buckets, no cross product") {
    val p = plan("q46_dedup_embed_cosine")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
  }

  test("q48b IVF: probes broadcast; inverted lists never shuffle") {
    val p = plan("q48b_ann_ivf")
    // candidate search joins broadcast probes to the corpus-side lists
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q49 lang id: pure map-side scoring before one aggregation shuffle") {
    val p = plan("q49_lang_id")
    assert(!p.contains("Join"), p.take(2000)) // no join at all
    assert("Exchange".r.findAllIn(p).size <= 2, p.take(2000)) // agg + sort only
  }

  test("q67 splits: map-side bucketing, single aggregation, no join") {
    val p = plan("q67_split_assign")
    assert(!p.contains("Join"), p.take(2000)) // bucket+split are projections
    assert(p.contains("partial_"), p.take(2000)) // map-side combine before the shuffle
  }

  test("q68 repetition: fully row-local metrics, no join/explode/aggregation") {
    val p = plan("q68_repetition")
    assert(!p.contains("Join") && !p.contains("Generate") && !p.contains("HashAggregate"),
      p.take(2000))
    assert("Exchange".r.findAllIn(p).size <= 1, p.take(2000)) // output sort only
  }

  test("q69 pii scrub: one scan, projections only, no exchange before the sort") {
    val p = plan("q69_pii_scrub")
    assert(!p.contains("Join"), p.take(2000))
    // detection + redaction are row-local; the only exchange is the output sort
    assert("Exchange".r.findAllIn(p).size <= 1, p.take(2000))
  }

  test("q70 token rarity: zipf-bounded vocab broadcast, corpus side never shuffle-joins") {
    val p = plan("q70_token_rarity")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p.take(3000))
  }

  test("q71 multimodal headers: no exchange beyond the explicit repartition + output sort") {
    val p = plan("q71_multimodal_headers")
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p.take(2000))
    // exactly: the decode stage's explicit repartition(media_id) and the
    // output sort's range exchange — construct/parse are row-local
    assert("Exchange".r.findAllIn(p).size <= 2, p.take(2000))
  }

  test("q70b forced over-budget: SHUFFLE_HASH on the token key, never sort-merge or broadcast") {
    val p = plan("q70b_token_rarity_shuffle")
    assert(p.contains("ShuffledHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q72 decontamination: eval grams broadcast, corpus side never shuffle-joins") {
    val p = plan("q72_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p.take(3000))
  }

  test("q72b forced over-budget: SHUFFLE_HASH on the gram key") {
    val p = plan("q72b_decontaminate_shuffle")
    assert(p.contains("ShuffledHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q74 packing: one window shuffle on the shard key, no join") {
    val p = plan("q74_seq_pack")
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("Window"), p.take(2000))
    // the shard hash exchange + the output range sort, nothing else
    assert("Exchange".r.findAllIn(p).size <= 2, p.take(2000))
  }

  test("q77 emission: window + chunk agg + output sort, no join, explode stays row-local") {
    val p = plan("q77_seq_emit")
    assert(!p.contains("Join"), p.take(3000))
    // the per-doc chunk-range explode (Generate) sits BETWEEN the window
    // and the (shard, chunk) aggregation — a ~1× expansion, not token count
    assert(p.contains("Generate"), p.take(3000))
    assert(p.contains("partial_"), p.take(3000)) // map-side combine into the chunk agg
    // window shard exchange + chunk-agg exchange + output range sort
    assert("Exchange".r.findAllIn(p).size <= 3, p.take(3000))
  }

  test("q84 k-means: centroid set rides a one-row broadcast; assignment never windows/sorts the corpus") {
    val p = plan("q84_kmeans_assign")
    // the only nested-loop joins are the 1-row centroid-array attaches
    // (broadcast), and the corpus is never range- or window-exchanged
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q85 semantic dedup: within-cluster pairs via equi join on cid, no cross product") {
    val p = plan("q85_semantic_dedup")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("q90 as-of join: union+window rewrite — no join operator, one key shuffle") {
    val p = plan("q90_asof_attrib")
    assert(!p.contains("Join"), p.take(3000)) // the whole point: no pair blowup
    assert(p.contains("Window"), p.take(3000))
    assert(p.contains("Union"), p.take(3000))
    // the window's hash exchange on user_id + the output range sort
    assert("Exchange".r.findAllIn(p).size <= 2, p.take(3000))
  }

  test("q91 keyless range join: binned to an equi join — never nested-loop/cartesian") {
    val p = plan("q91_range_join_binned")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      p.take(3000))
    // the bucket key makes it a real equi join (either shuffle family is fine)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("Generate"), p.take(3000)) // interval → covered-bucket explode
  }

  private val joinOps =
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r

  test("q78 canonicalize: exactly ONE join — corpus vs the dup-tail cluster relation") {
    val p = plan("q78_dedup_canonical")
    // pairs + connected components ran eagerly behind checkpoint barriers;
    // the returned plan must be a single left join of the corpus against
    // the (dup-tail-bounded) cluster assignment — nothing pairwise
    assert(joinOps.findAllIn(p).size == 1, p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
  }

  test("q81 incremental verify: byte-gated merge-walk — no verify exchange, never cartesian") {
    plan("q81_dedup_incremental") // building the query captures the pre-checkpoint plan
    val p = graft.operators.Dedup.lastIncrementalPlan
    assert(p.nonEmpty)
    // r16 re-pin: the verify's sets side is candidate-id-pruned — batch-
    // sized plus index collisions, NOT index-sized — so under the byte
    // budget the verify runs as the batch pipeline's broadcast merge-walk
    // (one mapPartitions pass, zero verify exchanges); the old
    // always-SHUFFLE_HASH plan cost two candidate-sized exchanges per
    // batch. The driver-collect concern the old pin encoded is carried by
    // the byte gate (over-budget → shuffle verify, q81b's pinned chain).
    assert(p.contains("MapPartitions"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
    // the merge-walk consumes the PERSISTED candidate relation — the
    // probe/intra union is computed once, not replayed per verify pass
    // (the InMemoryRelation's own cached plan is printed below it; any
    // joins THERE are candidate generation, not verify). No verify-stage
    // join above the scan: MapPartitions reads the cache directly.
    assert(p.contains("InMemoryTableScan"), p.take(3000))
    assert(!joinOps.findFirstIn(p.substring(0, p.indexOf("InMemoryTableScan")))
      .isDefined, p.take(3000))
  }

  test("q81b forced semi prune: left-semi pruning of the verify sets, same SHUFFLE_HASH verify") {
    plan("q81b_dedup_incremental_semi")
    val p = graft.operators.Dedup.lastIncrementalPlan
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.contains("ShuffledHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
  }

  test("q85 semantic dedup: the k-means lineage is persisted — all three consumers read one cache") {
    val p = plan("q85_semantic_dedup")
    // both pair-join sides + the final left-anti scan the SAME
    // InMemoryRelation; without it the centroid-init + Lloyd + assignment
    // chain replays per consumer (a triple corpus read at 100 TB)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3, p.take(3000))
  }

  test("q95 merge: compaction window upstream of exactly ONE full-outer join") {
    val p = plan("q95_merge_upsert")
    assert(p.contains("Window"), p.take(3000))
    assert(joinOps.findAllIn(p).size == 1, p.take(3000))
    assert(p.contains("FullOuter"), p.take(3000))
  }

  test("q72c bloom decontamination: sketch prefilter sits on the corpus stream, join stays broadcast") {
    val p = plan("q72c_decontaminate_bloom")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p.take(3000))
    // the closure probe appears as a non-codegen UDF filter — on the
    // already-exploded gram stream, before the exchange/join
    assert(p.contains("UDF"), p.take(3000))
  }

  test("q101 kmv: sketch-pair stage is all broadcast — nothing corpus-sized crosses it") {
    val p = plan("q101_kmv_source_sim")
    // the |sources|-row sketch relations join by broadcast (pair matrix +
    // exact-evidence joins); the only shuffles are the distinct-hash
    // aggregation and the per-source rank window
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(3000))
  }

  test("q103 inverted index: bounded exchange count, banded-terms side broadcast") {
    val p = plan("q103_inverted_index")
    // two-pass shape (r9): distinct pairs are lineage-truncated (the RDD
    // scan), df counts on the tiny pair relation, band filter, then the
    // banded side broadcasts back onto pairs — so the visible exchanges
    // are df-count + posting-agg + output sort, and the join is broadcast
    // (hot out-of-band terms die map-side, never crossing an exchange)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p.take(3000))
  }

  test("q104 surprisal: vocabulary under budget broadcasts — corpus token stream never shuffles for the join") {
    val p = plan("q104_lm_surprisal")
    // q70's byte-gate doctrine: the sf-test vocab is far under 256 MB, so
    // the join MUST be broadcast here (the over-budget SHUFFLE_HASH leg is
    // exercised by q70b's forced variant, same gate code)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("q111 cms: counter build is map-side combined; probe joins stay broadcast") {
    val p = plan("q111_cms_heavy_hitters")
    // the (j, cell) grouped count MUST partial-aggregate below its
    // exchange — that is the whole mergeability claim (≤ depth·width
    // rows cross the wire regardless of corpus size)
    assert(p.contains("partial_count"), p.take(3000))
    // sketch (≤2048 rows) and candidates (≤ topK) join by broadcast —
    // a corpus-sized SMJ here would mean the synopsis isn't one
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("q113 classifier: model application is join-free — one exchange for the source rollup") {
    val p = plan("q113_hashed_classifier")
    // the hashing trick's plan-shape signature: NO weight-table join
    // anywhere (the 'model' is a projection), map-side partial agg, and
    // the only exchanges are the source rollup + output sort
    assert(joinOps.findAllIn(p).isEmpty, p.take(3000))
    assert(p.contains("partial_"), p.take(3000))
    assert("Exchange".r.findAllIn(p).size <= 2, p.take(3000))
  }

  test("q106 priority sample: rank-limit becomes a distributed top-k — the corpus never single-partitions") {
    val p = plan("q106_priority_sample")
    // the row_number ≤ k+1 filter must not execute as a full
    // single-partition window sort: Spark rewrites it either to
    // TakeOrderedAndProject (per-partition top-k + driver merge — what
    // 4.1 plans here) or to a Partial WindowGroupLimit below the
    // exchange; both ship k+1 rows per partition, never the corpus
    assert(p.contains("TakeOrderedAndProject") ||
      (p.contains("WindowGroupLimit") && p.contains("Partial")), p.take(3000))
  }

  test("q115 paragraph dedup: keep-first is an AGGREGATE argmin — no window over the sentence key") {
    val p = plan("q115_paragraph_dedup")
    // a row_number window partitioned by sentence would sort every
    // occurrence list (skew magnet: a million-way duplicated sentence
    // lands on one task); the min-struct aggregate combines map-side
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("partial_min") || p.contains("partial_"), p.take(3000))
  }

  test("q116 profiler: every metric for every column from ONE scan of the table") {
    val p = plan("q116_profile")
    assert("Scan parquet".r.findAllIn(p).size === 1, p.take(3000))
    assert(p.contains("Expand"), p.take(3000)) // the multi-DISTINCT rewrite
    assert(!p.contains("Join"), p.take(3000))
  }

  test("q132 argmax-per-group: partial-combined aggregate, NO window sort") {
    val p = plan("q132_argmax_pergroup")
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("partial_"), p.take(3000)) // map-side max_by combine
  }

  test("q120 salted window: no Window operator, totals broadcast back") {
    val p = plan("q120_salted_window")
    assert(!p.contains("Window") && p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q120b salted window forced fallback: SHUFFLE_HASH re-attach, no broadcast") {
    val p = plan("q120b_salted_window_shuffle")
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("ShuffledHashJoin") && !p.contains("BroadcastHashJoin"),
      p.take(3000))
  }

  test("q103 inverted index: df band filter UPSTREAM of the posting aggregation") {
    val p = plan("q103_inverted_index")
    // two-pass shape: postings are collect_list over band-filtered pairs —
    // the one-shuffle collect_set-then-filter form held corpus-sized state
    // for stopword terms in a single aggregation cell
    assert(p.contains("collect_list") && !p.contains("collect_set"), p.take(4000))
    val bandFilter = """Filter \(\(df#\d+L >= 2\) AND \(df#\d+L <= 50\)\)""".r
    assert(bandFilter.findFirstIn(p).isDefined, p.take(4000))
    // plans print root-first, so the (downstream) set aggregation must
    // appear BEFORE the (upstream) band filter in the text
    assert(p.indexOf("collect_list") < bandFilter.findFirstMatchIn(p).get.start,
      p.take(4000))
  }

  test("q129 sorted-neighborhood: bucket equi join, never a range/cartesian plan") {
    val p = plan("q129_sorted_neighborhood")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
  }

  test("q134 span corruption: positions join spans on the equi block key") {
    val p = plan("q134_span_corruption")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
  }

  test("q136 drift: only the bounded grid cross-product, corpus never pair-joined") {
    val p = plan("q136_token_drift")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the topK × sources dense-grid build (both sides bounded
    // aggregates) appears once per self-join side; the corpus-sized
    // relations only ever meet equi-joins
    assert("BroadcastNestedLoop".r.findAllIn(p).size <= 2, p.take(4000))
    assert(p.contains("BroadcastNestedLoopJoin BuildLeft, Cross"), p.take(4000))
  }

  test("q143 suffix ranks: NO window anywhere — dense ranks from range partitions + offset broadcast") {
    val p = plan("q143_suffix_ranks")
    // a partition-less dense_rank would appear as a Window over a
    // single-partition sort — the one-task collapse the operator exists
    // to avoid; the materialized doubling rounds surface as RDD scans
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("Scan ExistingRDD"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000)) // offsets attach
  }

  test("q145 backoff LM: vocab joins only — no window, no cartesian beyond the 1-row totals") {
    val p = plan("q145_backoff_trigram")
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("partial_"), p.take(3000)) // map-side vocab combine
  }

  test("q146 phrase scrub: dictionary broadcast; rebuild aggregates map-side") {
    val p = plan("q146_phrase_scrub")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000)) // dict join
    assert(p.contains("partial_"), p.take(3000))
  }

  test("q147 PQ: codebook rides one-row broadcasts; top-k is group-limited, never single-partitioned early") {
    val p = plan("q147_ann_pq")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("SortMergeJoin"), p.take(4000))
    // the packed codebook / query-LUT attach as 1-row broadcast nested
    // loops (the q84 shape); the rank window is pruned per-partition
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(4000))
    assert(p.contains("WindowGroupLimit"), p.take(4000))
  }

  test("q148 novelty: ownership is an AGGREGATE struct-min — no window over the gram key") {
    val p = plan("q148_gram_novelty")
    // a row_number window per gram would serialize a hot gram's
    // million occurrences onto one task; min(struct) combines map-side
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("partial_min"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
  }

  test("q154 covariance: vector data never joins — only d-bounded broadcasts attach") {
    val p = plan("q154_embed_cov")
    // a self-join on vec_id would move every vector d times through an
    // exchange; the nested-HOF expansion keeps the d²/2 products inside
    // the scan task and the groupBy state at d(d+1)/2 fixed-width cells.
    // The only joins are the (i,j) decode + per-dim sums — ≤ d(d+1)/2
    // rows each, broadcast.
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("partial_"), p.take(3000))
  }

  test("q151 script mix: row-local histogram, single aggregation exchange") {
    val p = plan("q151_script_mix")
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("partial_"), p.take(3000))
  }

  test("q152 winsorize: threshold relation joins back WITHOUT a forced broadcast hint") {
    val p = plan("q152_winsorize")
    // the |groups|-sized thresholds may legitimately broadcast under
    // AQE's own sizing, but never a cartesian / nested loop; and the
    // table-side percentile never runs through an object-buffer
    // aggregate (the percentile() state bomb) — only sort windows
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
    assert(!p.contains("ObjectHashAggregate"), p.take(3000))
  }

  test("q161 char collision: pure projection — no join, window, or aggregate") {
    val p = plan("q161_char_collision")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(3000))
    assert(!p.contains("HashAggregate"), p.take(3000))
  }

  test("q163 gate funnel: ONE aggregate pass, no join, map-side partials") {
    val p = plan("q163_gate_funnel")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(3000))
    assert(p.contains("partial_"), p.take(3000))
  }

  test("q167 reliability: corpus rank is range-partitioned, never a global window") {
    val p = plan("q167_reliability")
    // a row_number() OVER (ORDER BY …) would plan Window over a
    // SinglePartition exchange — the one shape this operator exists to
    // avoid; the rank must come from the range exchange + local pass
    assert(!p.contains("Window"), p.take(4000))
    assert(p.contains("rangepartitioning"), p.take(4000))
  }

  test("TPC-H 2..22 gates: no CartesianProduct; nested-loop joins only against literal-sized sides") {
    // the derived-partsupp CTE (scount: 1 row, sgen: 4 rows) legitimately
    // plans CROSS JOINs as BroadcastNestedLoopJoin with an O(1)-row build
    // side — any OTHER nested-loop (or a true cartesian) in these shapes
    // would be a data-sized blowup at 100 TB
    for (name <- Seq("q_tpch_02", "q_tpch_04", "q_tpch_07", "q_tpch_08",
                     "q_tpch_09", "q_tpch_11", "q_tpch_12", "q_tpch_15",
                     "q_tpch_16", "q_tpch_17", "q_tpch_19", "q_tpch_20",
                     "q_tpch_21", "q_tpch_22")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n${p.take(3000)}")
      val nPartsupp = Seq("q_tpch_02", "q_tpch_09", "q_tpch_11", "q_tpch_16",
        "q_tpch_20").count(_ == name)
      if (nPartsupp == 0)
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n${p.take(3000)}")
    }
    // EXISTS / NOT EXISTS / IN must plan as semi/anti joins, not subplans
    assert(plan("q_tpch_04").contains("LeftSemi"))
    assert(plan("q_tpch_21").contains("LeftSemi"))
    assert(plan("q_tpch_21").contains("LeftAnti"))
    assert(plan("q_tpch_22").contains("LeftAnti"))
    assert(plan("q_tpch_16").contains("LeftAnti")) // NOT IN → null-aware anti
  }

  test("q177 PCA projection: pure projection over the corpus — no join, no aggregate exchange") {
    // the component rides as a literal array; the only exchange is the
    // output sort's range partitioning
    val p = plan("q177_pc_projection")
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("HashAggregate"), p.take(2000))
    assert("Exchange".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("q178 water-fill: ONE corpus scan; windows only over the strata relation") {
    val p = plan("q178_water_fill")
    assert(p.contains("partial_sum"), p.take(3000)) // per-stratum sum combines map-side
    // τ is a window max over the SAME ranked relation — a second
    // aggregate branch would scan the corpus twice
    assert("FileScan parquet".r.findAllIn(p).size === 1, p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
  }

  test("q179 label model: row-local vote — no join, single aggregation-free projection") {
    val p = plan("q179_label_model")
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("HashAggregate"), p.take(2000))
  }

  test("q184 CDC chunking: row-local chunk pipeline — no window, no join") {
    val p = plan("q184_cdc_chunks")
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("partial_count"), p.take(2000)) // rollup combines map-side
  }

  test("q185 conjunctive search: df relation broadcast, no cartesian") {
    val p = plan("q185_conjunctive_search")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("TakeOrdered"), p.take(3000)) // top-k never global-sorts
  }

  test("q190 mean pool: one aggregation, no join, map-side partials") {
    val p = plan("q190_mean_pool")
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("partial_count"), p.take(2000))
  }
}
