package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, length}

import graft.SparkEntry
import graft.operators.Dedup

/**
 * Scaling-curve evidence for the iterative/corpus-statistics operators:
 * generates a 10× documents corpus (50k docs — sf1-equivalent; the driver
 * testdata tops out at sf0.1 = 5k docs and is read-only), runs the
 * operators whose cost model needs MEASURED curves (q44 MinHash-LSH, q45
 * SimHash, q66b forced-distributed clustering, q70/q70b token rarity) at
 * both scales, and prints per-scale medians plus the structural counters
 * the 100 TB story rests on: pair counts (should grow ~linearly with the
 * planted dup rate), connected-components round count (should stay
 * O(log n)), and the q70 vocabulary byte estimate (should stay far under
 * the broadcast budget). Results are recorded in SCALING.md.
 *
 * The generated corpus mirrors the driver generator's shape (word-salad
 * text over a small common vocabulary + per-doc rare tokens, ~300 chars
 * avg, 2% planted near-duplicates as one-token mutations of the previous
 * doc) and is PURELY deterministic from doc_id, so both scales and both
 * runs see identical bytes. Generation happens in executors via a pure
 * function of the id — no driver-side data, no RNG state.
 */
object ScalingBench {

  private val CommonVocab: Array[String] = Array(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "vector", "scan", "fast", "query", "agg", "slow", "value", "filter",
    "customer", "stream", "table", "join", "group", "window", "shuffle",
    "merge", "hash", "range", "index", "cache", "disk", "memory", "node",
    "stage", "task", "plan", "cost", "rule", "type", "null", "string",
    "double", "long", "byte", "read", "write", "skip", "prune", "bucket",
    "skew")

  /** splitmix64-style deterministic mix. */
  private def mix(a: Long, b: Long): Long = {
    var x = a * 0x9E3779B97F4A7C15L + b + 0x632BE59BD9B4E019L
    x ^= x >>> 32; x *= 0xD6E8FEB86659FD93L
    x ^= x >>> 32; x *= 0xD6E8FEB86659FD93L
    x ^= x >>> 32
    x
  }

  /** Base text for a doc id: 12..75 tokens; ~1 in 7 tokens is a rare
    * per-corpus token (w<k>), the rest draw from the common vocabulary —
    * zipf-ish head + long tail, like a crawled corpus.
    *
    * `heaps = true` switches to a Heaps-law-like distribution (HALF the
    * tokens rare, rare space ∝ nDocs): the default's fixed 48-word head
    * saturates the 3-gram space at ~100× corpus (collision density then
    * grows quadratically — a property of the synthetic distribution,
    * not of any operator), so the banded dedup ops need the realistic
    * mode to be measurable at large absolute scale. */
  private def baseText(id: Long, nDocs: Long, heaps: Boolean = false): String = {
    val n = 12 + (mix(id, 0).abs % 64).toInt
    val sb = new StringBuilder
    val rareMod = if (heaps) 2 else 7
    val rareSpace = math.max(if (heaps) nDocs else nDocs / 5, 1)
    var p = 0
    while (p < n) {
      val h = mix(id, p + 1)
      if (p > 0) sb.append(' ')
      if (h.abs % rareMod == 0)
        sb.append("w").append((h.abs / rareMod) % rareSpace)
      else sb.append(CommonVocab((h.abs % CommonVocab.length).toInt))
      p += 1
    }
    sb.toString
  }

  /** 2% of docs (id % 50 == 3) are near-duplicates: the PREVIOUS doc's
    * text with its first token replaced — Jaccard ≫ 0.7 on 3-gram
    * shingles, exactly the pair shape q44/q66 must find. */
  def docText(id: Long, nDocs: Long, heaps: Boolean = false): String =
    if (id % 50 == 3 && id > 0) {
      val t = baseText(id - 1, nDocs, heaps)
      "mutated" + t.dropWhile(_ != ' ')
    } else baseText(id, nDocs, heaps)

  private def generate(spark: SparkSession, dir: String, nDocs: Long,
                       heaps: Boolean = false): Unit = {
    import spark.implicits._
    val n = nDocs
    val hp = heaps
    spark.range(n).map { id =>
      val text = docText(id, n, hp)
      val langs = Array("en", "de", "fr", "es", "zh")
      (id, text, langs((mix(id, -1).abs % langs.length).toInt),
        "src" + (id % 16), text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** 64-dim float vector, purely deterministic from vec_id; components in
    * [-1, 1). */
  private def baseVec(id: Long): Array[Float] = {
    val v = new Array[Float](64)
    var j = 0
    while (j < 64) {
      v(j) = ((mix(id, 100 + j) % 1000) / 1000.0f)
      j += 1
    }
    v
  }

  /** 2% of vectors (id % 50 == 3) are near-duplicates of the previous
    * vector (one component nudged by 0.01 — cosine ≈ 1), the pair shape
    * q85's within-cluster dedup must find. */
  def embVec(id: Long): Array[Float] =
    if (id % 50 == 3 && id > 0) {
      val v = baseVec(id - 1); v(0) = v(0) + 0.01f; v
    } else baseVec(id)

  private def generateEmb(spark: SparkSession, dir: String, nVecs: Long): Unit = {
    import spark.implicits._
    // label mirrors the driver table's int32 label column (16 groups,
    // deterministic from id) — q156 centroid cosine groups on it
    spark.range(nVecs).map(id => (id, embVec(id), (mix(id, -2).abs % 16).toInt))
      .toDF("vec_id", "embedding", "label")
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** The sweep list, hoisted so QueryPackSpec can assert every name is
    * a registered SparkEntry query — a typo here crashes the driver's
    * scaling capture, not CI, unless pinned (same failure mode as
    * Bench.headline, same test). */
  val sweep: Seq[String] = Seq(
      "q44_dedup_minhash_lsh",
      "q45_dedup_simhash",
      "q66b_dedup_clusters_dist",
      "q70_token_rarity",
      "q70b_token_rarity_shuffle",
      "q72_decontaminate",
      "q72c_decontaminate_bloom",
      "q76_curation_funnel",
      "q78_dedup_canonical",
      "q85_semantic_dedup",
      "q88_source_overlap",
      "q93_dup_spans",
      "q94_span_scrub",
      "q101_kmv_source_sim",
      "q103_inverted_index",
      "q104_lm_surprisal",
      "q105_pmi_collocations",
      "q115_paragraph_dedup",
      "q117_ann_rerank",
      "q120_salted_window",
      "q121b_image_neardup",
      "q123_snapshot_diff",
      "q126_hashing_vectorize",
      "q127_byte_chunks",
      "q128_rendezvous_shard",
      "q133_dedup_keep_best",
      "q134_span_corruption",
      "q136_token_drift",
      "q137_length_batches",
      "q139_cjk_neardup",
      "q140_bpe_merges",
      "q141_bpe_tokenize",
      "q142_bigram_surprisal",
      "q143_suffix_ranks",
      "q144_lcp_repeats",
      "q145_backoff_trigram",
      "q146_phrase_scrub",
      "q147_ann_pq",
      "q147b_ann_pq256",
      "q148_gram_novelty",
      "q149_tfidf_pairs",
      "q150_multimodal_pack",
      "q151_script_mix",
      "q152_winsorize",
      "q153_classifier_kappa",
      "q154_embed_cov",
      "q155_url_dedup",
      "q156_centroid_cosine",
      "q157_trend_slope",
      "q158_robots_filter",
      "q160_mixture_weights",
      "q161_char_collision",
      "q162_margin_mining",
      "q163_gate_funnel",
      "q166_data_card",
      "q167_reliability",
      "q168_k_anonymity",
      "q169_crawl_schedule",
      "q170_ann_ivfpq",
      "q170b_ann_ivfpq_shuffle",
      "q171_k_generalize",
      // round-12 tier (documents/embeddings shapes; q188 needs lineitem,
      // which the 10× generator does not mirror — its 9-cell aggregate
      // has no scale-sensitive structure anyway)
      "q172_noised_release",
      "q173_semantic_decontam",
      "q174_leakage_safe_split",
      "q175_mmr_select",
      "q176_top_pc",
      "q177_pc_projection",
      "q178_water_fill",
      "q179_label_model",
      "q180_cluster_weights",
      "q181_vocab_growth",
      "q182_apportion_slots",
      "q183_ann_recall_report",
      "q184_cdc_chunks",
      "q185_conjunctive_search",
      "q186_canary_audit",
      "q187_distinctive_terms",
      "q189_readability",
      "q190_mean_pool",
      "q191_apportioned_sample",
      "q192_data_card_v2")
      // q194_dedup_minhash_scaled is timed by its dedicated block below
      // (pairs without the gate's orderBy, plus CC over the scaled pairs)

  def main(args: Array[String]): Unit = {
    val tenxDir = args.headOption.getOrElse("/tmp/graft_scaling_10x")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_SCALING_NDOCS overrides the corpus size (default 50k =
    // 10×): pass 500000 with a fresh dir for a 100× two-decade curve.
    val nDocsGen = sys.env.get("SPARK_GRAFT_SCALING_NDOCS")
      .map(_.toLong).getOrElse(50000L)
    // SPARK_GRAFT_SCALING_HEAPS=true: Heaps-law-like rare-token growth
    // (see baseText) — required to measure the banded dedup ops at
    // >=100x, where the default head-heavy distribution saturates the
    // gram space.
    val heapsGen = sys.env.get("SPARK_GRAFT_SCALING_HEAPS").contains("true")
    if (!new java.io.File(s"$tenxDir/documents.parquet").exists()) {
      println(s"[scaling] generating corpus at $tenxDir ($nDocsGen docs, heaps=$heapsGen)")
      generate(spark, tenxDir, nDocsGen, heapsGen)
    }
    val embPath = s"$tenxDir/embeddings.parquet"
    val embStale = new java.io.File(embPath).exists() &&
      !spark.read.parquet(embPath).columns.contains("label")
    if (!new java.io.File(embPath).exists() || embStale) {
      println(s"[scaling] generating 10x embeddings at $tenxDir (20k vectors)" +
        (if (embStale) " [regenerating: pre-r10 file lacks label]" else ""))
      generateEmb(spark, tenxDir, 20000L)
    }

    val queries = sweep

    def median(ts: Seq[Double]) = ts.sorted.apply(ts.size / 2)

    // clearCache() drops persisted relations but NOT localCheckpoint
    // (truncated-lineage) blocks — those free only when the JVM GC lets
    // the ContextCleaner reap the RDD references. A 48g heap GCs lazily,
    // so the suffix builds' level tables (~5 GB each, several builds per
    // measured query) piled up as zombie disk blocks and exhausted the
    // sandbox disk at the 500k tier. Forcing a GC between measurements
    // keeps the block manager honest; it runs OUTSIDE every timed region.
    def reclaim(): Unit = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(200) // let the async ContextCleaner drain
    }

    // SPARK_GRAFT_SCALING_TIERS="/tmp/h50k=50000,/tmp/h500k=500000"
    // REPLACES the default (driver sf0.1 + tenxDir) sweep dirs with an
    // explicit tier ladder — each missing tier is generated with the
    // given doc count (embeddings at 2n/5 vectors, the 10× ratio) under
    // the SPARK_GRAFT_SCALING_HEAPS distribution flag. This is how the
    // two-decade exponent fits below get SAME-DISTRIBUTION points.
    val sweepDirs: Seq[String] = sys.env.get("SPARK_GRAFT_SCALING_TIERS") match {
      case Some(spec) =>
        spec.split(",").toSeq.map { kv =>
          val Array(d, n) = kv.split("=")
          val nd = n.toLong
          if (!new java.io.File(s"$d/documents.parquet").exists()) {
            println(s"[scaling] generating tier $d ($nd docs, heaps=$heapsGen)")
            generate(spark, d, nd, heapsGen)
          }
          if (!new java.io.File(s"$d/embeddings.parquet").exists()) {
            println(s"[scaling] generating tier embeddings at $d (${math.max(nd * 2 / 5, 100L)} vectors)")
            generateEmb(spark, d, math.max(nd * 2 / 5, 100L))
          }
          d
        }
      case None => Seq("/root/testdata/sf0.1", tenxDir)
    }

    // per-tier stats for the exponent fit: dir -> (nDocs, parallel
    // efficiency measured right before that tier's sweep); medians keyed
    // (query, dir). PE-normalizing each point before fitting removes
    // host co-tenancy drift from the slope (the r10 lesson).
    val tierStats = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Double)]
    val tierMedians = scala.collection.mutable.LinkedHashMap.empty[(String, String), Double]

    // PEAK per-task execution memory per measured query (max over all
    // tasks of the query's 3 runs) — the "partitions fit in executor
    // memory" claim as a number instead of a plan argument. Same
    // listener mechanism the as-of block uses; peakExecutionMemory is
    // the task's high-water mark across its operators (sort/agg/join
    // buffers), i.e. the per-task budget a cluster executor must grant.
    val peakTaskMem = new java.util.concurrent.atomic.AtomicLong(0L)
    val memListener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null)
          peakTaskMem.accumulateAndGet(m.peakExecutionMemory, (a, b) => math.max(a, b))
      }
    }
    spark.sparkContext.addSparkListener(memListener)

    // SPARK_GRAFT_SCALING_ONLY=q121b,q123 restricts the sweep while
    // iterating — the SAME rule as Verify's SPARK_GRAFT_ONLY
    // (graft.QuerySelect: exact name or non-digit-extending prefix).
    val only = graft.QuerySelect.parse(sys.env.get("SPARK_GRAFT_SCALING_ONLY"))
    val selected = queries.filter(q =>
      only.forall(graft.QuerySelect.matches(_, q)))

    for (dir <- sweepDirs) {
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      val pe = graft.Bench.parallelEfficiency()
      tierStats(dir) = (nDocs, pe)
      println(f"[scaling] corpus $dir: $nDocs docs, parallel_efficiency=$pe%.2f")
      for (q <- selected) {
        // noop sink, not count(): count() lets Catalyst prune projections
        // and even eliminate unique-key outer joins (q94's rebuild side
        // vanished entirely — 0.3 s for a query whose work is the md5
        // reassembly), under-reporting expression-heavy queries. Same
        // rationale as Bench. Row counts are read once, outside timing.
        // Cached intermediates from PREVIOUS queries are dropped first —
        // accumulated storage pressure across the (growing) query list
        // slowed later queries ~2× via eviction/GC, which is measurement
        // noise, not operator cost.
        reclaim()
        val rows = SparkEntry.queries(q)(spark, dir).count()
        peakTaskMem.set(0L) // count() above warms plans; measure the runs
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          (sec, rows)
        }
        val extra =
          if (q.startsWith("q66b")) s" rounds=${Dedup.lastDistributedRounds}"
          else if (q.startsWith("q143") || q.startsWith("q144"))
            s" rounds=${graft.operators.SuffixIndex.lastRounds}"
          else ""
        val med = median(runs.map(_._1))
        tierMedians((q, dir)) = med
        println(f"[scaling] $q%-28s $dir%-28s median=$med%7.2f s" +
          f" eff=${med * pe}%7.2f core-s rows=${runs.head._2}%-7d" +
          f" peakTaskMem=${peakTaskMem.get() / 1024 / 1024}MiB$extra")
      }

      // BAND-BUCKET DIAGNOSTIC (select q194_bucket_histogram): per
      // profile, the band-bucket size distribution and the EXACT implied
      // candidate volume Σ C(size, 2) — one aggregation pass over the
      // band relation, no pair join, so it is safe to run at tiers where
      // the join itself would exhaust disk. This is how the candidate
      // explosion is attributed to data (hot buckets) instead of guessed
      // from sampled-pair Jaccard models.
      if (only.forall(graft.QuerySelect.matches(_, "q194_bucket_histogram"))) {
        import graft.operators.TextHashing.LshBanding
        import org.apache.spark.sql.functions.{count => fcount, lit => flit, sum => fsum, max => fmax, col => fcol}
        val sets = Dedup.gramSets(
          spark.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("text")), "doc_id", "text").persist()
        try {
          for (b <- Seq(LshBanding.Default, LshBanding.Scaled)) {
            val sizes = Dedup.bandRelation(
                Dedup.signaturesFromSets(sets, b), sizeAware = false, b)
              .groupBy(fcol("sig")).agg(fcount(flit(1)).as("s"))
            val agg = sizes.agg(
              fsum(org.apache.spark.sql.functions.expr("s * (s - 1) div 2"))
                .as("cand"),
              fmax(fcol("s")).as("maxb"),
              fcount(flit(1)).as("buckets")).collect()(0)
            val top = sizes.orderBy(fcol("s").desc).limit(10).collect()
              .map(_.getLong(1)).mkString(",")
            println(s"[scaling] q194_bucket_histogram (${b.numBands}x${b.rowsPerBand}) $dir " +
              s"cand=${agg.getLong(0)} maxBucket=${agg.getLong(1)} " +
              s"buckets=${agg.getLong(2)} top10=$top")
          }
        } finally sets.unpersist(blocking = false)
        // TOKEN-shingle profile over the same corpus: the universe-growing
        // fix for the saturation the char-gram rows above measure. Same
        // Σ C(size, 2) candidate accounting, so the collapse (or not) of
        // the n² term is read off the same metric.
        val tsets = Dedup.tokenShingleSets(
          spark.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("text")), "doc_id", "text").persist()
        try {
          val b = LshBanding.Scaled
          val sizes = Dedup.bandRelation(
              Dedup.wideSignaturesFromSets(tsets, b), sizeAware = false, b)
            .groupBy(fcol("sig")).agg(fcount(flit(1)).as("s"))
          val agg = sizes.agg(
            fsum(org.apache.spark.sql.functions.expr("s * (s - 1) div 2"))
              .as("cand"),
            fmax(fcol("s")).as("maxb"),
            fcount(flit(1)).as("buckets")).collect()(0)
          val top = sizes.orderBy(fcol("s").desc).limit(10).collect()
            .map(_.getLong(1)).mkString(",")
          val uni = tsets.select(org.apache.spark.sql.functions
            .explode(fcol("gs")).as("h")).distinct().count()
          println(s"[scaling] q199_bucket_histogram (tokens ${b.numBands}x${b.rowsPerBand}) $dir " +
            s"cand=${agg.getLong(0)} maxBucket=${agg.getLong(1)} " +
            s"buckets=${agg.getLong(2)} universe=$uni top10=$top")
        } finally tsets.unpersist(blocking = false)
      }

      // q144 COST ATTRIBUTION: one instrumented crossDocRepeats run per
      // tier — per-level pair-table survivor counts (start, minLen
      // rank-equality prefilter, then each level's dead-pair prune), the
      // r12 verdict's ask. Diagnostic mode checkpoints per level, so its
      // wall time is NOT comparable to the sweep's fused run; the counts
      // are the deliverable.
      if (only.forall(graft.QuerySelect.matches(_, "q144_lcp_repeats"))) {
        import graft.operators.SuffixIndex
        reclaim()
        SuffixIndex.crossDocRepeats(
            spark.read.parquet(s"$dir/documents.parquet")
              .select(col("doc_id"), col("text")),
            "doc_id", "text", levelStats = true)
          .write.format("noop").mode("overwrite").save()
        val counts = SuffixIndex.lastLevelSurvivors
          .map { case (l, n) => s"$l=$n" }.mkString(" ")
        println(s"[scaling] q144_level_survivors         $dir $counts")
      }

      // WINNOWING pairs (select q196_winnow_neardup): the third pairing
      // family at the tiers — df-capped fingerprint equi-join, recall vs
      // the planted mutations. The fingerprint universe is token-5-gram
      // md5s (Heaps-growing like q199's shingles), so the df cap should
      // rarely bite and candidates should stay near-linear.
      if (only.forall(graft.QuerySelect.matches(_, "q196_winnow_neardup"))) {
        // minShared sweep (r13 verdict #7): q196's 2% planted-recall
        // misses at minShared=3 are threshold semantics on the shortest
        // docs — measure what relaxing to 2 buys (recall) and costs
        // (extra pair volume = the precision trade), tier by tier, so
        // the knob is documented like the bucket cap. The gate setting
        // (3) keeps the tierMedians key for the exponent fit.
        Seq(3, 2).foreach { ms =>
          reclaim()
          def wPairs() = Dedup.winnowPairs(
            spark.read.parquet(s"$dir/documents.parquet")
              .select(col("doc_id"), col("text")),
            "doc_id", "text", k = 5, w = 4, minShared = ms, dfCap = 50)
          val found = wPairs().persist()
          val nFound = found.count()
          val planted = found.filter(
            col("id_b") === col("id_a") + 1 && col("id_b") % 50 === 3).count()
          val nPlanted = nDocs / 50
          found.unpersist(blocking = false)
          val runs = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            wPairs().write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          val wmed = median(runs)
          if (ms == 3) tierMedians(("q196_winnow_neardup", dir)) = wmed
          println(f"[scaling] q196_winnow_neardup ms=$ms   $dir%-28s median=$wmed%7.2f s" +
            f" eff=${wmed * pe}%7.2f core-s rows=$nFound%-7d" +
            f" planted=$planted/$nPlanted")
        }
      }

      // TOKEN-shingle pairs (select q199_dedup_minhash_tokens): the
      // uncapped universe-growing profile at every tier, with recall vs
      // the same planted 2% mutations the capped block measures — the
      // head-to-head against q194's cap-mitigated char-gram banding.
      if (only.forall(graft.QuerySelect.matches(_, "q199_dedup_minhash_tokens"))) {
        import graft.operators.TextHashing.LshBanding
        reclaim()
        def tokenPairs() = Dedup.minHashLshPairsTokens(
          spark.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("text")),
          "doc_id", "text", 0.7, banding = LshBanding.Scaled)
        val found = tokenPairs().persist()
        val nFound = found.count()
        val planted = found.filter(
          col("id_b") === col("id_a") + 1 && col("id_b") % 50 === 3).count()
        val nPlanted = nDocs / 50
        found.unpersist(blocking = false)
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          tokenPairs().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val tmed = median(runs)
        tierMedians(("q199_dedup_minhash_tokens", dir)) = tmed
        println(f"[scaling] q199_dedup_minhash_tokens $dir%-28s median=$tmed%7.2f s" +
          f" eff=${tmed * pe}%7.2f core-s rows=$nFound%-7d" +
          f" planted=$planted/$nPlanted")
      }

      // CAPPED scaled banding (select q194_capped): the scaled profile
      // plus the bucket-size cap (SPARK_GRAFT_SCALING_MAXBUCKET, default
      // 500) — the configuration for gram-universe-saturated corpora
      // where the bucket histogram shows Ω(n²) candidates under any
      // (b, r). Reports found pairs AND recall vs the planted 2%
      // mutation count (ids with id%50==3, id>0 — the ground truth this
      // generator embeds), so the cap's trade is measured per tier.
      if (only.forall(graft.QuerySelect.matches(_, "q194_capped"))) {
        import graft.operators.TextHashing.LshBanding
        reclaim()
        val cap = sys.env.get("SPARK_GRAFT_SCALING_MAXBUCKET")
          .map(_.toLong).getOrElse(500L)
        def cappedPairs() = Dedup.minHashLshPairsManaged(
          spark.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("text")),
          "doc_id", "text", 0.7, banding = LshBanding.Scaled,
          maxBucket = cap).df
        val found = cappedPairs().persist()
        val nFound = found.count()
        // planted ground truth: (id-1, id) for id%50==3 — count how many
        // the capped run recovers
        val planted = found.filter(
          col("id_b") === col("id_a") + 1 && col("id_b") % 50 === 3).count()
        val nPlanted = nDocs / 50 // ids 3, 53, ... (id 3 > 0 qualifies)
        found.unpersist(blocking = false)
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          cappedPairs().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val cmed = median(runs)
        tierMedians(("q194_capped", dir)) = cmed
        println(f"[scaling] q194_capped(cap=$cap)       $dir%-28s median=$cmed%7.2f s" +
          f" eff=${cmed * pe}%7.2f core-s rows=$nFound%-7d" +
          f" planted=$planted/$nPlanted")
        // clustering over the capped pairs — the q66b shape at the tier
        // where only the capped candidate stage is feasible; input is
        // the dup-tail pair graph, so this bounds the full
        // pairs→clusters dedup composition at the top tier
        reclaim()
        val cpairs = cappedPairs().persist(); cpairs.count()
        val ccRuns = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          Dedup.connectedComponents(cpairs, smallGraphMaxEdges = 0L)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        cpairs.unpersist(blocking = false)
        val ccm = median(ccRuns)
        tierMedians(("q66b_cc_over_capped_pairs", dir)) = ccm
        println(f"[scaling] q66b_cc_over_capped_pairs $dir%-28s median=$ccm%7.2f s" +
          f" eff=${ccm * pe}%7.2f core-s rounds=${Dedup.lastDistributedRounds}")
      }

      // COMPOSED end-to-end pipeline (select pipeline_composed; r13
      // verdict #5): every curve above is per-operator, but a real
      // curation job composes them — funnel (q76's lang-ID + quality
      // stages) → token-profile near-dup pairs (q199) → clusters →
      // canonicalize keep-min-id (q78) → 512-token sequence packing
      // (q77 emitChunks) as ONE job over the tier corpus. Reports wall,
      // effective core-s, total + peak-stage shuffle WRITE bytes, and
      // per-stage retention, so cross-stage surprises (lineage/persist
      // interactions, shuffle pressure stacking) are measured instead
      // of assumed. One localCheckpoint barrier after the funnel: the
      // dedup pipeline consumes the survivors three times (sets, band
      // join sides, canonical join) — without the barrier each consumer
      // would re-run the lang-ID/quality scan.
      if (only.forall(graft.QuerySelect.matches(_, "pipeline_composed"))) {
        import graft.operators.{Packing, TextAnalysis}
        import graft.operators.TextHashing.LshBanding
        reclaim()
        val shufTotal = new java.util.concurrent.atomic.AtomicLong(0L)
        val shufPeak = new java.util.concurrent.atomic.AtomicLong(0L)
        val shufListener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
            shufTotal.addAndGet(w)
            shufPeak.accumulateAndGet(w, (a, b) => math.max(a, b))
          }
        }
        spark.sparkContext.addSparkListener(shufListener)
        try {
          def funnel() = {
            val docs = spark.read.parquet(s"$dir/documents.parquet")
              .select(col("doc_id"), col("source"), col("lang"), col("text"))
            // und-fallback: the synthetic vocabulary contains no stopwords
            // of any marker language, so the n-gram classifier abstains
            // ("und") on every doc — fall back to the declared lang
            // column when it does (the rule a real pipeline applies to
            // crawl records carrying an HTML lang tag). ~20% retention,
            // the funnel shape the composition needs; the classifier and
            // quality scans still run at full width.
            TextAnalysis.langPredicted(docs, "text",
                Seq("doc_id", "source", "lang", "text"))
              .withColumn("quality", TextAnalysis.qualityScore(length(col("text")),
                TextAnalysis.punctRatio(col("text")), TextAnalysis.meanWordLen(col("text"))))
              .filter((col("predicted") === "en" ||
                (col("predicted") === "und" && col("lang") === "en")) &&
                col("quality") >= 0.5)
              .select(col("doc_id"), col("source"), col("text"))
              .localCheckpoint()
          }
          // r14 verdict #5: the measured path IS the product path — the
          // dedup stage goes through nearDupPairsAuto (probe → dispatch),
          // not a hand-picked profile; the probe's recommendation is
          // printed per tier so SCALING.md can record whether it matches
          // the hand-pick (token, uncapped) that r13/r14 measured.
          def composed(survivors: org.apache.spark.sql.DataFrame) = {
            val pairs = Dedup.nearDupPairsAuto(survivors, "doc_id", "text", 0.7)
            val clusters = Dedup.connectedComponents(pairs)
              .withColumnRenamed("doc_id", "_cid")
            val canonical = survivors
              .join(clusters, survivors("doc_id") === col("_cid"), "left")
              .filter(col("rep_id").isNull || col("rep_id") === survivors("doc_id"))
              .drop("_cid", "rep_id")
            Packing.emitChunks(canonical, col("source"), col("doc_id"),
              col("text"), 512)
          }
          // instrumented pass: per-stage retention (one extra count per
          // boundary; the timed runs below carry none of these actions)
          val s0 = funnel()
          val n1 = s0.count()
          val pairs0 = Dedup.nearDupPairsAuto(s0, "doc_id", "text", 0.7).persist()
          val rec = Dedup.lastRecommendation.get
          println(f"[scaling] pipeline_composed probe $dir: profile=${rec.profile} " +
            f"maxBucket=${rec.maxBucket} newGramRate=${rec.newGramRate}%.4f " +
            f"nonAsciiRate=${rec.nonAsciiRate}%.4f estPairsPerDoc=${rec.estPairsPerDoc}%.2f " +
            f"(hand-pick was token/uncapped; match=${rec.profile == "token" && rec.maxBucket == 0L})")
          val nPairs = pairs0.count()
          val clusters0 = Dedup.connectedComponents(pairs0)
            .withColumnRenamed("doc_id", "_cid")
          val canon0 = s0.join(clusters0, s0("doc_id") === col("_cid"), "left")
            .filter(col("rep_id").isNull || col("rep_id") === s0("doc_id"))
            .drop("_cid", "rep_id").persist()
          val n2 = canon0.count()
          val n3 = Packing.emitChunks(canon0, col("source"), col("doc_id"),
            col("text"), 512).count()
          pairs0.unpersist(blocking = false)
          canon0.unpersist(blocking = false)
          println(f"[scaling] pipeline_composed retention $dir: docs=$nDocs -> " +
            f"funnel=$n1 -> pairs=$nPairs -> canonical=$n2 -> chunks=$n3")
          // timed end-to-end runs (scan through packed emission)
          val runs = (1 to 3).map { _ =>
            reclaim()
            shufTotal.set(0L); shufPeak.set(0L)
            val t0 = System.nanoTime()
            composed(funnel()).write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            println(f"[scaling] pipeline_composed run: $dt%7.2f s " +
              f"shuffle_write=${shufTotal.get() / 1048576.0}%9.1f MiB " +
              f"peak_stage=${shufPeak.get() / 1048576.0}%9.1f MiB")
            dt
          }
          val pmed = median(runs)
          tierMedians(("pipeline_composed", dir)) = pmed
          println(f"[scaling] pipeline_composed         $dir%-28s median=$pmed%7.2f s" +
            f" eff=${pmed * pe}%7.2f core-s")
        } finally spark.sparkContext.removeSparkListener(shufListener)
      }

      // The SCALED banding profile (q194 shape) + clustering over its
      // pairs — the dedup configuration that runs at the top tier, where
      // the default (4,4) banding is candidate-bound (SCALING.md). Pairs
      // and the q66b-shape forced-distributed CC are timed separately so
      // the exponent fit attributes cost to the right stage.
      if (only.forall(graft.QuerySelect.matches(_, "q194_dedup_minhash_scaled"))) {
        import graft.operators.TextHashing.LshBanding
        reclaim()
        def scaledPairs() = Dedup.minHashLshPairsManaged(
          spark.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("text")),
          "doc_id", "text", 0.7, banding = LshBanding.Scaled).df
        val pairRows = scaledPairs().count()
        val pairRuns = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          scaledPairs().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val pmed = median(pairRuns)
        tierMedians(("q194_dedup_minhash_scaled", dir)) = pmed
        println(f"[scaling] q194_dedup_minhash_scaled  $dir%-28s median=$pmed%7.2f s" +
          f" eff=${pmed * pe}%7.2f core-s rows=$pairRows%-7d")
        reclaim()
        val pairs = scaledPairs().persist(); pairs.count()
        val ccRuns = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          Dedup.connectedComponents(pairs, smallGraphMaxEdges = 0L)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        pairs.unpersist(blocking = false)
        val cmed = median(ccRuns)
        tierMedians(("q66b_cc_over_scaled_pairs", dir)) = cmed
        println(f"[scaling] q66b_cc_over_scaled_pairs  $dir%-28s median=$cmed%7.2f s" +
          f" eff=${cmed * pe}%7.2f core-s rounds=${Dedup.lastDistributedRounds}")
      }

      // THE incremental claim (q81 shape): a FIXED batch against a
      // precomputed index of a 10×-growing corpus — per-batch cost must
      // stay ~flat, because the probe join ships only colliding bands and
      // existing×existing candidates are structurally impossible. The
      // batch is the same 500 docs (10x generator text, ids < 500) at both
      // scales; the index is each scale's corpus restricted to id ≥ 500
      // (id uniqueness across index and batch is the operator contract).
      // Index build/persist happens OUTSIDE the timed region — that is the
      // point: at 100 TB you index once and pay per-batch forever after.
      if (only.forall(graft.QuerySelect.matches(_, "q81_incremental_fixedbatch"))) {
        import spark.implicits._
        val batch = spark.range(500L).map(id => (id, docText(id, 50000L)))
          .toDF("doc_id", "text")
        val existing = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text")).filter(col("doc_id") >= 500L)
        reclaim()
        val index = Dedup.dedupIndex(existing, "doc_id", "text")
        val bands = index.bands.persist(); bands.count()
        val sets = index.sets.persist(); sets.count()
        val idx = Dedup.DedupIndex(bands, sets)
        val rows = Dedup.incrementalPairs(idx, batch, "doc_id", "text", 0.7).count()
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          Dedup.incrementalPairs(idx, batch, "doc_id", "text", 0.7)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        bands.unpersist(blocking = false); sets.unpersist(blocking = false)
        val bmed = median(runs)
        tierMedians(("q81_incremental_fixedbatch", dir)) = bmed
        println(f"[scaling] q81_incremental_fixedbatch $dir%-28s median=$bmed%7.2f s" +
          f" eff=${bmed * tierStats(dir)._2}%7.2f core-s rows=$rows%-7d")
      }
    }

    // FITTED GROWTH EXPONENT per query over the measured tiers:
    // least-squares slope of log(PE-normalized median) vs log(nDocs).
    // alpha ≈ 1 is corpus-linear, < 1 sub-linear (fixed overhead still
    // amortizing), > 1 super-linear (the thing the 100 TB story must
    // either fix or floor-document). Needs >= 2 tiers; PE-normalization
    // keeps host co-tenancy drift between tiers out of the slope.
    if (tierStats.size >= 2) {
      val measured = tierMedians.keys.map(_._1).toSeq.distinct
      for (q <- measured) {
        val pts = tierStats.toSeq.flatMap { case (d, (n, pe)) =>
          tierMedians.get((q, d)).map(t => (math.log(n.toDouble), math.log(t * pe)))
        }
        if (pts.size >= 2) {
          val k = pts.size
          val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
          val sxx = pts.map(p => p._1 * p._1).sum
          val sxy = pts.map(p => p._1 * p._2).sum
          val alpha = (k * sxy - sx * sy) / (k * sxx - sx * sx)
          println(f"[scaling] exponent $q%-30s alpha=$alpha%5.2f over $k tiers" +
            f" (${tierStats.head._2._1} -> ${tierStats.last._2._1} docs, PE-normalized)")
        }
      }
    }

    // PageRank (q114) scales over the REAL event tables (10k → 100k
    // events, sf0.01 → sf0.1): the structural claim is that per-round
    // cost is EDGE-bound, and the transition edge set saturates at
    // |V|² long before events stop growing — so the only events-linear
    // stage is the one window pass that builds the edges. Edge count is
    // printed to pin the saturation.
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
         if only.forall(graft.QuerySelect.matches(_, "q114_pagerank"))) {
      reclaim()
      val nEv = spark.read.parquet(s"$dir/events.parquet").count()
      val q = SparkEntry.queries("q114_pagerank")
      val edges = {
        import graft.operators.GraphRank
        val ev = graft.Tables.load(spark, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            org.apache.spark.sql.functions.regexp_extract(
              col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("item"))
        GraphRank.transitionEdges(ev, "item", "user_id", Seq("ts", "event_id")).count()
      }
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scaling] q114_pagerank $dir%-28s median=${median(runs)}%7.2f s" +
        f" events=$nEv%-8d edges=$edges%-7d")
    }

    // Triangles (q118) + label propagation (q124) on a SKEWED synthetic
    // graph — one celebrity vertex adjacent to 30% of ALL vertices. The
    // claim under measurement is the Latapy degree-ordered orientation
    // bound: max ORIENTED out-degree stays O(√m) even though the raw
    // degree distribution has a 0.3·|V| whale, so the wedge stage — the
    // term a naive neighbor join explodes on — is bounded. Counters
    // (wedges, max outdeg) come from GraphRank.lastWedgeCount /
    // lastMaxOutDegree, computed analytically off the oriented relation.
    // Edges are pure xxhash64 functions of the edge index — both scales
    // and both runs see identical graphs, generated in executors.
    // As-of join: the union+window REWRITE (q90 shape) vs the NATIVE
    // merge-walk operator (q90b shape) on the same synthetic event
    // stream at 100k / 1M / 10M events. Both are timed AND measured for
    // peak per-task execution memory (SparkListener, max over tasks):
    // the claim the native operator exists for is that its probe side
    // buffers ONE row per key behind the sort, where the rewrite's
    // union must co-sort both streams and carry the window state —
    // a memory difference, not only a time one. Events are pure
    // xxhash64 functions of the row id: identical across runs/scales.
    if (only.forall(graft.QuerySelect.matches(_, "q90_asof_scaling"))) {
      import graft.operators.Temporal
      import org.apache.spark.sql.functions.{lit, pmod, when, xxhash64, timestamp_seconds}
      val peak = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null)
            peak.accumulateAndGet(m.peakExecutionMemory, (a, b) => math.max(a, b))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      def synthEvents(n: Long): org.apache.spark.sql.DataFrame =
        spark.range(n).select(
          col("id").as("event_id"),
          pmod(xxhash64(col("id"), lit(7)), lit(n / 100)).as("user_id"),
          timestamp_seconds(lit(1600000000L) +
            pmod(xxhash64(col("id"), lit(11)), lit(86400L * 30))).as("ts"),
          (pmod(xxhash64(col("id"), lit(13)), lit(1000)).cast("double") / 10.0)
            .as("value"),
          when(pmod(xxhash64(col("id"), lit(17)), lit(4)) === 0, "purchase")
            .otherwise("view").as("event_type"))
      for (n <- Seq(100000L, 1000000L, 10000000L)) {
        val ev = synthEvents(n).persist(); ev.count()
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        def rewrite() = Temporal.asOfJoin(
          purchases,
          ev.filter(col("event_type") === "view")
            .select(col("event_id"), col("user_id"), col("ts"), col("value")),
          leftKey = col("user_id"), rightKey = col("user_id"),
          leftTime = col("ts"), rightTime = col("ts"),
          payload = Seq("v_event_id" -> col("event_id"), "v_value" -> col("value")),
          tieBreak = col("event_id"))
        def native() = Temporal.asOfJoinNative(
          purchases,
          ev.filter(col("event_type") === "view")
            .select(col("user_id"), col("ts"), col("event_id"),
              col("event_id").as("v_event_id"), col("value").as("v_value")),
          leftKey = "user_id", rightKey = "user_id",
          leftTime = "ts", rightTime = "ts",
          payload = Seq("v_event_id", "v_value"), tieBreak = "event_id")
        for ((label, mk) <- Seq("q90_asof_rewrite" -> (() => rewrite()),
                                "q90b_asof_native" -> (() => native()))) {
          reclaim(); ev.persist(); ev.count()
          peak.set(0L)
          val runs = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            mk().write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[scaling] $label%-18s events=$n%-9d median=${median(runs)}%7.2f s" +
            f" peakTaskMem=${peak.get() / 1024 / 1024} MiB")
        }
        ev.unpersist(blocking = false)
      }
      spark.sparkContext.removeSparkListener(listener)
    }

    if (only.forall(t => graft.QuerySelect.matches(t, "q118_triangles") ||
        graft.QuerySelect.matches(t, "q124_label_prop"))) {
      import graft.operators.GraphRank
      import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
      // SPARK_GRAFT_SCALING_GRAPH100X=true adds the third decade
      // (2M vertices, 10M edges + a 600k-degree celebrity) — the 100×
      // point for the Latapy bound and LPA's edge-linear rounds.
      val graphTiers = Seq((20000L, 100000L), (200000L, 1000000L)) ++
        (if (sys.env.get("SPARK_GRAFT_SCALING_GRAPH100X").contains("true"))
           Seq((2000000L, 10000000L)) else Nil)
      for ((nV, nE) <- graphTiers) {
        val rand = spark.range(nE).select(
          pmod(xxhash64(col("id"), lit(1)), lit(nV)).as("src"),
          pmod(xxhash64(col("id"), lit(2)), lit(nV)).as("dst"),
          lit(1L).as("w"))
        val celeb = spark.range(nV)
          .filter(pmod(col("id"), lit(10)) < 3 && col("id") =!= 0L)
          .select(lit(0L).as("src"), col("id").as("dst"), lit(1L).as("w"))
        val edges = rand.union(celeb)
        val m = edges.count()
        reclaim()
        val triRuns = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          GraphRank.triangleCounts(edges)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scaling] q118_triangles_skew |V|=$nV%-7d m=$m%-8d" +
          f" median=${median(triRuns)}%7.2f s wedges=${GraphRank.lastWedgeCount}" +
          f" maxOutDeg=${GraphRank.lastMaxOutDegree}" +
          f" sqrtM=${math.sqrt(m.toDouble).toLong}")
        reclaim()
        val lpaRuns = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          GraphRank.labelPropagation(edges, 4)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scaling] q124_label_prop_skew |V|=$nV%-7d m=$m%-8d" +
          f" median=${median(lpaRuns)}%7.2f s rounds=4")
      }
    }
    spark.stop()
  }
}
