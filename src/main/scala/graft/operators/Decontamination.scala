package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: find training documents that overlap an
 * evaluation set through shared token n-gram runs — the standard guard
 * against test-set leakage in a training corpus (the 13-gram-overlap
 * method of Brown et al. 2020, appendix C, re-expressed over this
 * corpus's shorter documents with a configurable n).
 *
 * Shape, designed for 100 TB corpus vs ~10⁴-10⁶-doc eval sets:
 *  - eval side: explode to DISTINCT n-gram fingerprints (tiny — bounded
 *    by eval tokens), then joined to the corpus grams. The join key is
 *    the md5 of the space-joined window, so the DuckDB oracle reproduces
 *    the fingerprints exactly with its own md5.
 *  - corpus side: one projection computes each doc's distinct gram
 *    fingerprints row-locally (no corpus-wide shuffle before the join);
 *    the explode happens right at the join.
 *  - the join is byte-gated like every small side in this library:
 *    eval grams under the budget broadcast (corpus side stays
 *    shuffle-free — the plan a decontamination pass MUST have at 100 TB);
 *    over budget falls back to SHUFFLE_HASH, oracle-identical
 *    (q72/q72b, the q44b/q66b/q70b pattern).
 *
 * Output: one row per CONTAMINATED corpus doc (≥1 shared n-gram) with its
 * distinct-gram count and overlap count — the review queue a curation
 * pipeline feeds to its drop/flag policy.
 */
object Decontamination {

  /** Distinct md5 fingerprints of the token n-grams over an
    * ALREADY-SPLIT token-array attribute (whitespace tokens, windows of
    * n, space-rejoined before hashing). Row-local, no UDF; empty below n
    * tokens. `ts` must be a materialized attribute — the slice inside
    * the transform lambda re-evaluates its child per gram, so a fused
    * split(text) argument costs O(n_grams × |text|) re-splits per doc
    * (the round-13 winnowing doctrine, TextHashing.winnowSelect). */
  def tokenGramFingerprintsFromTokens(ts: Column, n: Int): Column = {
    val grams = when(size(ts) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ts) - (n - 1)),
        i => md5(concat_ws(" ", slice(ts, i, lit(n))))))
    array_distinct(grams)
  }

  /** Composable reference form over raw text — specs/small fixtures
    * only; operator call sites barrier the split first. */
  def tokenGramFingerprints(text: Column, n: Int): Column =
    tokenGramFingerprintsFromTokens(split(text, " "), n)

  /** Contamination report: corpus docs sharing ≥1 token n-gram with the
    * eval set. `broadcastBudgetBytes` gates the eval-gram broadcast (md5
    * hex = 32 chars ≈ 64 B UTF-16 + entry overhead per distinct gram). */
  def contaminationReport(corpus: DataFrame, evalSet: DataFrame,
                          id: String, text: String, n: Int = 8,
                          broadcastBudgetBytes: Long = 256L * 1024 * 1024)
    : DataFrame = {
    val evalGrams = distinctEvalGrams(evalSet, text, n)
    // 1-row sizing agg on the (tiny) eval side only — the corpus is never
    // scanned for sizing
    val nGrams = evalGrams.agg(count(lit(1))).collect()(0).getLong(0)
    val estBytes = nGrams * (64L + 48L)
    val evalSide =
      if (estBytes <= broadcastBudgetBytes) broadcast(evalGrams)
      else evalGrams.hint("SHUFFLE_HASH")
    overlapReport(corpus, evalSide, id, text, n, prefilter = None)
  }

  /** Same report with a Bloom prefilter on the corpus gram stream — the
    * plan for an eval set too large to broadcast as a hash relation. The
    * q72b fallback shuffles EVERY corpus gram to meet the eval grams; at
    * 100 TB that shuffle is the bill. A Bloom filter over the eval grams
    * is ~1.2 MB per million grams at 1% fpp — broadcastable long after
    * the exact set is not — and drops ~99% of corpus grams BEFORE the
    * exchange. False positives are then eliminated by the exact
    * (SHUFFLE_HASH-gated) join on the survivors, so the report is
    * bit-identical to [[contaminationReport]] — q72c shares q72's oracle.
    *
    * The membership probe is a Scala closure over the driver-built sketch
    * (`DataFrameStatFunctions.bloomFilter`) because Spark exposes no
    * public mightContain Column function; it breaks codegen only for the
    * one short-circuit filter on the already-exploded stream. */
  def contaminationReportBloom(corpus: DataFrame, evalSet: DataFrame,
                               id: String, text: String, n: Int = 8,
                               fpp: Double = 0.01,
                               broadcastBudgetBytes: Long = 256L * 1024 * 1024)
    : DataFrame = {
    val evalGrams = distinctEvalGrams(evalSet, text, n)
    val nGrams = evalGrams.agg(count(lit(1))).collect()(0).getLong(0)
    val bf = evalGrams.stat.bloomFilter("g", math.max(nGrams, 1L), fpp)
    val bfBc = corpus.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((g: String) => bfBc.value.mightContain(g))
    val estBytes = nGrams * (64L + 48L)
    val evalSide =
      if (estBytes <= broadcastBudgetBytes) broadcast(evalGrams)
      else evalGrams.hint("SHUFFLE_HASH")
    overlapReport(corpus, evalSide, id, text, n, prefilter = Some(mightContain(_)))
  }

  private def distinctEvalGrams(evalSet: DataFrame, text: String, n: Int) =
    evalSet
      .select(split(col(text), " ").as("_ts"))
      .select(explode(tokenGramFingerprintsFromTokens(col("_ts"), n)).as("g"))
      .distinct()

  /** Corpus-side gram explode + overlap join + per-doc report, shared by
    * the exact and Bloom-prefiltered paths. */
  private def overlapReport(corpus: DataFrame, evalSide: DataFrame,
                            id: String, text: String, n: Int,
                            prefilter: Option[Column => Column]): DataFrame = {
    // explode_OUTER + explicit null filter, NOT plain explode: with a
    // non-outer generate over the aliased array, InferFiltersFromGenerate
    // pushes an inferred `size(gs) > 0` filter BELOW the projection,
    // inlining the whole gram-hash expression into the filter — the md5
    // chain then runs ~3× per row (measured 4.8 s → 1.7 s for this stage
    // at sf0.1). The outer generate emits one null-g row per empty array,
    // which the isNotNull filter (and the inner join) drops — answers
    // identical, expression evaluated once.
    val grams = corpus
      .select(col(id).as("cid"), split(col(text), " ").as("_ts"))
      .select(col("cid"), tokenGramFingerprintsFromTokens(col("_ts"), n).as("gs"))
      .select(col("cid"), size(col("gs")).as("n_grams"), explode_outer(col("gs")).as("g"))
      .filter(col("g").isNotNull)
    val pruned = prefilter.fold(grams)(p => grams.filter(p(col("g"))))
    pruned
      .join(evalSide, "g")
      .groupBy(col("cid"))
      .agg(first(col("n_grams")).as("n_grams"), count(lit(1)).as("n_overlap"))
      .select(col("cid").as(id), col("n_grams"), col("n_overlap"))
  }

  /** Cross-source duplication matrix: for every pair of sources, how
    * many DISTINCT token n-gram fingerprints they share — the "is domain
    * A scraping domain B" / "do these two crawls overlap" audit a corpus
    * assembler runs before fixing mixture weights or train/eval splits
    * by source.
    *
    * Shape chosen for scale — there is NO gram self-join: one aggregation
    * collects each gram's (sorted, distinct) source set, grams present in
    * more than `maxSources` sources are DROPPED, and the pair expansion
    * is a row-local nested transform bounded by C(maxSources, 2). The cap
    * is both the skew guard (a boilerplate gram shared by thousands of
    * domains would otherwise fan out quadratically) and a signal choice:
    * ubiquitous grams say nothing about pairwise copying. The final
    * matrix groupBy is |sources|² at most — tiny. */
  def crossSourceOverlap(docs: DataFrame, source: String, text: String,
                         n: Int = 3, maxSources: Int = 5): DataFrame = {
    val bySrc = docs
      .select(col(source).as("src"), split(col(text), " ").as("_ts"))
      .select(col("src"),
        explode(tokenGramFingerprintsFromTokens(col("_ts"), n)).as("g"))
      .distinct()
    bySrc.groupBy(col("g"))
      .agg(sort_array(collect_set(col("src"))).as("srcs"))
      .filter(size(col("srcs")).between(2, maxSources))
      .select(explode(flatten(
        transform(col("srcs"), (a, i) =>
          transform(slice(col("srcs"), i + lit(2), size(col("srcs")) - i - 1),
            b => struct(a.as("src_a"), b.as("src_b")))))).as("p"))
      .groupBy(col("p").getField("src_a").as("src_a"),
        col("p").getField("src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** SEMANTIC decontamination: training vectors within cosine `tau` of
    * ANY eval-set vector — the embedding-space complement of the n-gram
    * overlap above. Paraphrased or lightly-reworded test items share few
    * 8-gram fingerprints but sit next to their source in embedding
    * space; modern benchmark-decontamination stacks run BOTH detectors
    * (n-gram for verbatim leakage, embedding for paraphrase leakage)
    * and this is the second one.
    *
    * Shape: sign-LSH bucketed (the q48 machinery) — candidates share
    * the first-`bits` sign bucket, then the exact codegen'd cosine
    * verifies against `tau`. Bucketing, never all-pairs: per-bucket
    * volume is |train|/2^bits × |eval|/2^bits in expectation, with the
    * documented exact-bucket recall trade (q48 vs q48b) — production
    * tau is high (near-copies), exactly where sign agreement is
    * likeliest. The eval side is bounded by construction (a benchmark,
    * not a corpus) — but "bounded" is not "small" when every row carries
    * an embedding (1M eval vectors × 768 floats ≈ 3 GB), so the attach
    * is byte-gated like every small side in this library: under
    * `broadcastBudgetBytes` → broadcast (train side stays shuffle-free,
    * the 100 TB plan); over → SHUFFLE_HASH on the bucket key, where the
    * train side is already hashing (q72/q72b, the q170/q170b pattern).
    * q173b forces the fallback and shares q173's oracle verbatim.
    *
    * Output: one row per contaminated train vector with its
    * BEST-matching eval item (max r6 cosine, smaller eval id on ties —
    * the q47-family deterministic rank), which is what a review queue
    * shows a human. */
  def semanticContaminated(train: DataFrame, evalSet: DataFrame,
                           bits: Int, tau: Double,
                           broadcastBudgetBytes: Long = 256L * 1024 * 1024)
    : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = evalSet.select(col("vec_id").as("eval_id"),
      col("embedding").as("ev"),
      SimilaritySearch.signBucket(col("embedding"), bits).as("b"))
    val t = train.select(col("vec_id").as("train_id"),
      col("embedding").as("tv"),
      SimilaritySearch.signBucket(col("embedding"), bits).as("b"))
    // 1-row sizing agg on the (bounded) eval side only — never the corpus:
    // 4 B/float element + UnsafeArray header + row/bucket overhead per row.
    val sz = e.agg(count(lit(1)), avg(size(col("ev")))).collect()(0)
    val estBytes = sz.getLong(0) *
      (4L * Option(sz.get(1)).fold(0L)(_ => sz.getDouble(1).toLong) + 96L)
    val evalSide =
      if (estBytes <= broadcastBudgetBytes) broadcast(e)
      else e.hint("SHUFFLE_HASH")
    val w = Window.partitionBy(col("train_id"))
      .orderBy(col("cosine").desc, col("eval_id"))
    t.join(evalSide, Seq("b"))
      .select(col("train_id"), col("eval_id"),
        graft.Tables.r6(SimilaritySearch.cosine(col("tv"), col("ev")))
          .as("cosine"))
      .filter(col("cosine") >= tau)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("train_id"), col("eval_id"), col("cosine"))
  }
}
