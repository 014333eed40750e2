package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic content-keyed sampling and split assignment for training
 * corpora. Random sampling (rand(), TABLESAMPLE) is non-reproducible across
 * runs and engines; hash-based bucketing on a content key is the standard
 * replacement — the same document always lands in the same bucket, on any
 * cluster size, in any engine. Keying on the content fingerprint (rather
 * than a surrogate id) keeps byte-identical duplicates in the SAME split, so
 * train/test contamination can't sneak in through re-crawled copies.
 *
 * Scale: splitBucket is a pure codegen'd projection (md5 + string slice +
 * conv) — no shuffle, no state; sampling composes with scan pushdown and
 * the bucket filter is evaluated row-local on every executor.
 *
 * Portability: md5 hex is identical everywhere; the bucket is the first 8
 * hex digits parsed base-16 (Spark `conv(h,16,10)`, DuckDB `('0x'||h)::BIGINT`)
 * mod `buckets` — so the DuckDB oracle reproduces the assignment exactly.
 */
object Sampling {

  /** Stable bucket in [0, buckets) from an arbitrary string key: first 8
    * md5 hex digits as an integer, mod buckets. 8 hex digits = 32 bits of
    * the digest — far below collision concern for BUCKETING (uniformity is
    * what matters, not injectivity). A NULL key buckets as the empty
    * string, so null-keyed rows get ONE deterministic bucket — they land
    * in a split and sample consistently instead of assignSplit defaulting
    * them while hashSample silently drops them. */
  def splitBucket(key: Column, buckets: Int = 10000): Column =
    conv(substring(md5(coalesce(key, lit(""))), 1, 8), 16, 10).cast("long") % buckets

  /** Named split from a bucket: train/val/test by cumulative per-10000
    * weights (trainPer10k=8000, valPer10k=1000 → 80/10/10). */
  def assignSplit(bucket: Column, trainPer10k: Int = 8000, valPer10k: Int = 1000): Column =
    when(bucket < trainPer10k, "train")
      .when(bucket < trainPer10k + valPer10k, "val")
      .otherwise("test")

  /** Deterministic ratePer10k/10000 sample: keep rows whose key-bucket
    * falls below the rate. Stable under re-runs and corpus growth (a doc's
    * membership never depends on other rows — unlike reservoir or sorted
    * top-N sampling, which reshuffle membership every run at 100 TB). */
  def hashSample(df: org.apache.spark.sql.DataFrame, key: Column, ratePer10k: Int)
    : org.apache.spark.sql.DataFrame =
    df.filter(splitBucket(key) < ratePer10k)

  /** EXACT stratified sample: ceil(fraction × |stratum|) rows per stratum,
    * chosen deterministically (rows ranked inside each stratum by the md5
    * of the key — a content-keyed total order, so reruns and engines agree
    * bit-for-bit). hashSample's membership is per-row-independent but only
    * APPROXIMATELY proportional per stratum; domain-balancing a training
    * mix needs the exact count, which costs one window shuffle on the
    * stratum key. Skew note for 100 TB: one stratum = one partition in the
    * rank window — a pathologically dominant source should be pre-split
    * (salt the stratum, sample per shard, union) or rebalanced upstream;
    * for source-count-bounded corpora the shuffle is even.
    *
    * ==Key uniqueness is the caller's contract== — the determinism claim
    * holds only when `key` is unique per row within a stratum: duplicate
    * keys tie in the md5 order and row_number breaks the tie by
    * post-shuffle arrival, so WHICH duplicate crosses the cutoff can
    * differ between runs/engines. Salt the key with a unique id (q73
    * concatenates text+doc_id) when duplicates are possible. Output =
    * input columns; the `_rank`/`_n` helpers are dropped. */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, stratum: Column,
                       key: Column, fracPer10k: Int)
    : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(md5(coalesce(key, lit(""))))
    df.withColumn("_rank", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(stratum)))
      .filter(col("_rank") <= ceil(col("_n") * fracPer10k / 10000.0))
      .drop("_rank", "_n")
  }

  /** Per-stratum rates for √-temperature mixture sampling (the α = 0.5
    * setting of the temperature-reweighting rule used to rebalance
    * multilingual / multi-source training mixes — Conneau & Lample 2019
    * §3.1 shape): the LARGEST stratum keeps rate 10000 (everything) and a
    * stratum of n rows keeps floor(10000·√(n/max)) per 10000 — small
    * sources are kept at a disproportionately high rate, flattening the
    * mixture toward (but not all the way to) uniform.
    *
    * α is fixed at 0.5 because √ is the one power both engines compute
    * identically: IEEE sqrt and division are correctly rounded, so
    * floor() lands on the same integer everywhere; a general-α pow() can
    * differ by an ulp across libm implementations exactly at a floor
    * boundary. (A caller wanting another α writes the same three-line
    * skeleton with pow — and gives up bit-exact cross-engine rates.)
    *
    * Plan: one hash aggregate on the stratum key → a tiny per-stratum
    * relation → a 1-row global max crossed back in via broadcast. Nothing
    * here scales with row count except the first aggregate. */
  def sqrtTemperatureRates(df: org.apache.spark.sql.DataFrame, stratum: Column)
    : org.apache.spark.sql.DataFrame = {
    val counts = df.groupBy(stratum.as("stratum")).agg(count(lit(1)).as("n_total"))
    counts.crossJoin(broadcast(counts.agg(max(col("n_total")).as("_mx"))))
      .withColumn("rate_per10k",
        floor(lit(10000.0) * sqrt(col("n_total").cast("double") / col("_mx")))
          .cast("long"))
      .drop("_mx")
  }

  /** Apply √-temperature mixture sampling: keep a row iff its content-key
    * bucket falls under its stratum's rate. Membership stays per-row
    * deterministic (same key ⇒ same bucket as hashSample/assignSplit), so
    * re-runs and incremental corpus growth never reshuffle WHICH rows a
    * stratum keeps — only the rates move as counts drift. The rates join
    * is on the stratum key against a per-stratum relation; its size is
    * stratum cardinality (a bounded taxonomy for source-keyed mixes —
    * AQE broadcasts it; an unbounded stratum key would make the rule
    * itself meaningless before the join becomes the problem). */
  def sqrtTemperatureSample(df: org.apache.spark.sql.DataFrame, stratum: Column,
                            key: Column)
    : org.apache.spark.sql.DataFrame =
    df.withColumn("_b", splitBucket(key))
      .join(sqrtTemperatureRates(df, stratum).withColumnRenamed("stratum", "_s"),
        stratum === col("_s"))
      .filter(col("_b") < col("rate_per10k"))
      .drop("_b", "_s", "n_total", "rate_per10k")

  /** Keep each stratum's TOP fraction by a score — the quality-percentile
    * gate of a curation pipeline ("drop the bottom 75% by quality per
    * source"), expressed as exact ranks rather than an interpolated
    * percentile threshold: rank arithmetic is integer-exact cross-engine,
    * where a double quantile boundary can flip a row's membership by one
    * ulp. Ties in the score are broken by the content key's md5, so the
    * kept set is total-order deterministic ([[stratifiedSample]]'s key-
    * uniqueness contract applies). Same one-window-per-stratum shape —
    * and the same dominant-stratum skew note — as stratifiedSample. */
  def topFractionByScore(df: org.apache.spark.sql.DataFrame, stratum: Column,
                         score: Column, key: Column, fracPer10k: Int)
    : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(score.desc, md5(coalesce(key, lit(""))))
    df.withColumn("_rank", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(stratum)))
      .filter(col("_rank") <= ceil(col("_n") * fracPer10k / 10000.0))
      .drop("_rank", "_n")
  }

  /** Cap each stratum at `maxN` rows — the per-domain cap of web-corpus
    * curation (a handful of template-heavy domains would otherwise
    * dominate the mixture; RefinedWeb/C4 apply exactly this guard). The
    * kept subset is chosen by CONTENT-HASH rank, not arrival order: the
    * md5 of the content key is crawl-stable, so a re-crawl that appends
    * more pages from a capped domain keeps the SAME survivors and only
    * fills toward the cap — where "first N by ingest order" would churn
    * the corpus every run. One window per stratum (hash shuffle on the
    * stratum key); the dominant-stratum skew note of [[stratifiedSample]]
    * applies. Key uniqueness is the caller's contract. */
  def capPerStratum(df: org.apache.spark.sql.DataFrame, stratum: Column,
                    key: Column, maxN: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(md5(coalesce(key, lit(""))))
    df.withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= maxN)
      .drop("_rank")
  }

  /** Keep each stratum's docs — in crawl-stable content-hash order —
    * until a TOKEN budget fills: the step that turns per-source mixture
    * weights into an actual corpus ("this source contributes 2B
    * tokens"). A row is kept iff the running token sum INCLUDING it is
    * within budget; everything after the first overflow is dropped
    * (prefix property in the hash order — the kept set never churns when
    * a re-crawl appends more rows, same argument as [[capPerStratum]]).
    * One running-sum window per stratum with an explicit ROWS frame;
    * dominant-stratum skew note of [[stratifiedSample]] applies. */
  def capTokensPerStratum(df: org.apache.spark.sql.DataFrame, stratum: Column,
                          key: Column, nTokens: Column, budgetTokens: Long)
    : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(md5(coalesce(key, lit(""))))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("_cum", sum(nTokens).over(w))
      .filter(col("_cum") <= budgetTokens)
      .drop("_cum")
  }

  /** Deterministic global "shuffle" for training order: every row gets a
    * reproducible pseudo-random (shard, pos) — shard from the seeded
    * content-key hash, position by rank of that hash within the shard.
    * Re-seeding yields a fresh permutation without touching the data;
    * re-running (or re-computing on another engine) yields the identical
    * one — which is what makes a training run resumable and auditable,
    * where an orderBy(rand()) permutation is gone the moment the job
    * ends. Downstream packing ([[graft.operators.Packing]]) consumes
    * (shard, pos) directly as its shard/order columns.
    *
    * Scale: the shard hash exchange is the one shuffle; within a shard
    * the rank is a per-partition sort of corpus/nShards rows — size
    * nShards so a shard fits an executor (the same knob as any range
    * write). Key uniqueness is the caller's contract (duplicate keys tie
    * in the hash order; salt with a unique id). */
  def trainingOrder(df: org.apache.spark.sql.DataFrame, key: Column,
                    seed: String, nShards: Int)
    : org.apache.spark.sql.DataFrame = {
    val h = md5(concat(lit(seed), coalesce(key, lit(""))))
    df.withColumn("shard",
        conv(substring(h, 1, 8), 16, 10).cast("long") % nShards)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(h)))
  }

  /** Per-stratum UPSAMPLING rates that equalize the mixture toward the
    * largest stratum: a stratum of n rows gets rate floor(10000·max/n)
    * per-10000 — i.e. ~max/n epochs — capped at `capPer10k` (repeating a
    * tiny source hundreds of times degrades models faster than it
    * balances them; ~4 epochs is the conventional ceiling). The largest
    * stratum's rate is exactly 10000 (one epoch). Downsampling never
    * happens here: rates are ≥ 10000 by construction, the complement of
    * sqrtTemperatureRates (which only ever keeps ≤ everything).
    * Plan shape is identical to sqrtTemperatureRates: one hash aggregate
    * on the stratum key, a 1-row max crossed back via broadcast. */
  def epochBalanceRates(df: org.apache.spark.sql.DataFrame, stratum: Column,
                        capPer10k: Long = 40000L)
    : org.apache.spark.sql.DataFrame = {
    // rates are ≥ 10000 by construction (mx ≥ n); a sub-10000 cap would
    // silently turn upsampling into downsampling — refuse it
    require(capPer10k >= 10000L, s"capPer10k must be ≥ 10000, got $capPer10k")
    val counts = df.groupBy(stratum.as("stratum")).agg(count(lit(1)).as("n_total"))
    counts.crossJoin(broadcast(counts.agg(max(col("n_total")).as("_mx"))))
      .withColumn("rate_per10k",
        least(lit(capPer10k),
          floor(lit(10000.0) * col("_mx").cast("double") / col("n_total"))
            .cast("long")))
      .drop("_mx")
  }

  /** Apply epoch-balanced upsampling WITH REPLACEMENT: each row is emitted
    * floor(rate/10000) times, plus once more iff its content-key bucket
    * falls under the fractional remainder — so a stratum at rate 25000
    * emits every row twice and a deterministic, content-keyed half of the
    * rows a third time (expected total = 2.5 epochs exactly, and WHICH
    * rows get the extra copy is stable under re-runs and corpus growth,
    * per the [[splitBucket]] contract). Output adds `copy_idx` (1-based)
    * so downstream shuffling/packing can treat copies as distinct rows.
    *
    * Scale: one narrow rates join (stratum cardinality — broadcast by
    * AQE) and one `explode(sequence(1, n_copies))` whose expansion factor
    * is the epoch count (bounded by capPer10k/10000), not data size; no
    * extra shuffle — the explode is row-local and pipelines into whatever
    * consumes the mixture. */
  def epochUpsample(df: org.apache.spark.sql.DataFrame, stratum: Column,
                    key: Column, capPer10k: Long = 40000L)
    : org.apache.spark.sql.DataFrame = {
    val whole = (col("rate_per10k") / 10000L).cast("long")
    val extra = when(col("_b") < col("rate_per10k") % 10000L, 1L).otherwise(0L)
    df.withColumn("_b", splitBucket(key))
      .join(epochBalanceRates(df, stratum, capPer10k)
        .withColumnRenamed("stratum", "_s"), stratum === col("_s"))
      .withColumn("copy_idx", explode(sequence(lit(1L), whole + extra)))
      .drop("_b", "_s", "n_total", "rate_per10k")
  }

  /** Priority sampling (Duffield-Lund-Thorup, JACM 2007): a weighted
    * without-replacement sample of k rows whose Horvitz-Thompson
    * estimator weight max(w, τ) gives unbiased subset-sum estimates —
    * THE way to keep a fixed-budget audit sample of a 100 TB corpus that
    * still answers "how many tokens does slice X hold" without rescanning.
    *
    * Chosen over the better-known A-ES/A-ExpJ (Efraimidis-Spirakis)
    * family deliberately: A-ES keys are u^(1/w) — a transcendental pow
    * whose last-ulp behavior differs across engines (the `ln` problem of
    * bm25Scores/tokenRarity again) — while the priority q = w/u is ONE
    * exactly-rounded divide, so the oracle reproduces every priority,
    * the top-k cut, and τ bit-for-bit. Determinism: u is the md5-48
    * content hash mapped to (0,1], so the sample is stable across runs,
    * engines, and cluster sizes (the splitBucket doctrine).
    *
    * τ = the (k+1)-th largest priority (0 when the population is ≤ k —
    * then every row is sampled and est_weight = w exactly). Scale shape:
    * priorities are a row-local projection; top-(k+1) is a rank window
    * without PARTITION BY — Spark plans a per-partition TopK before the
    * single-partition final sort, so the exchange carries k+1 rows per
    * input partition, never the corpus. */
  def prioritySample(df: org.apache.spark.sql.DataFrame, key: Column,
                     weight: Column, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, "prioritySample needs k >= 1")
    // u ∈ (0,1]: (h+1)/2^48 as one exact bigint→double convert per side
    // and one exactly-rounded divide; priority = w/u, the same rules.
    val u = (TextAnalysis.md5Hash48(key) + lit(1L)).cast("double") /
      lit((1L << 48).toDouble)
    val withQ = df.withColumn("_q", weight.cast("double") / u)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_q").desc, key)
    val ranked = withQ.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k + 1)
    // 1-row τ aggregate: the (k+1)-th priority, or 0 when the population
    // is ≤ k (no such row — max over none is null, coalesced)
    val tau = ranked.agg(coalesce(
      max(when(col("_rn") === k + 1, col("_q"))), lit(0.0)).as("_tau"))
    ranked.filter(col("_rn") <= k)
      .crossJoin(broadcast(tau))
      .withColumn("est_weight", greatest(weight.cast("double"), col("_tau")))
      .drop("_q", "_rn", "_tau")
  }

  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar 1996): shard(key) = argmax over shards of
    * md5₄₈(key ‖ ':' ‖ shard), ties to the LARGER shard id (total order,
    * deterministic). Row-local — no shuffle, no lookup table — and the
    * property that matters for a training corpus's shard map: growing
    * n → n+1 shards moves ONLY the keys whose new shard wins the argmax,
    * an expected 1/(n+1) of the corpus, where a mod-n map reshuffles
    * almost everything. q128 pins assignments at 8 and 9 shards side by
    * side so the moved set itself is oracle-checked. */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 64, "rendezvousShard supports 1..64 shards")
    val best = array((0 until nShards).map(s =>
      struct(
        TextAnalysis.md5Hash48(concat_ws(":", key, lit(s))).as("w"),
        lit(s).as("s"))): _*)
    array_max(best).getField("s")
  }

  /** Source-mixture reweighting toward a TARGET token distribution — the
    * mixing-weights table every multi-source pretraining recipe ships
    * (web X%, code Y%, academic Z% of the token budget): for each
    * stratum, weight = target_share / actual_share, the factor to
    * multiply that source's sampling rate by so the sampled mixture
    * lands on the target. Weight > 1 means the source must be upsampled
    * (epochUpsample is the executor), < 1 downsampled (hashSample).
    *
    * `targets` is (stratum, target_ppm): the desired token share in
    * parts-per-million — integer, so the weight is the exact rational
    * target_ppm·total_tokens / (10⁶·stratum_tokens) evaluated as ONE
    * correctly-rounded double divide of DECIMAL(38,0) products (the
    * kappa/trendSlope doctrine; a long product of two token counts can
    * pass 2^63 at corpus scale). Strata absent from `targets` get NULL
    * weight (caller decides drop-vs-keep); target rows with no corpus
    * presence don't appear (there is nothing to reweight).
    *
    * Scale: ONE map-side-combinable groupBy over the corpus (|strata|
    * cells of two longs); the grand total is a PARTITION-BY-less window
    * over the already-aggregated |strata|-row relation (the q37
    * pre-aggregated pattern — the single-task stage sees tens of rows,
    * never the corpus, and the corpus is scanned exactly once, with no
    * reliance on runtime exchange reuse); then a broadcast join against
    * the user's target table. Nothing downstream of the scan is
    * corpus-sized. */
  def mixtureWeights(df: org.apache.spark.sql.DataFrame, stratum: Column,
                     tokens: Column, targets: org.apache.spark.sql.DataFrame)
    : org.apache.spark.sql.DataFrame = {
    val dec = "decimal(38,0)"
    val agg = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_docs"), sum(tokens.cast("long")).as("n_tokens"))
    agg.withColumn("_total",
        sum(col("n_tokens")).over(org.apache.spark.sql.expressions.Window
          .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)))
      .join(broadcast(targets.select(col("stratum").as("_s"),
        col("target_ppm").cast("long").as("target_ppm"))),
        col("stratum") === col("_s"), "left")
      .select(col("stratum"), col("n_docs"), col("n_tokens"), col("target_ppm"),
        graft.Tables.r6(col("n_tokens").cast("double") / col("_total").cast("double"))
          .as("actual_share"),
        graft.Tables.r6((col("target_ppm").cast(dec) * col("_total"))
          .cast("double") /
          (col("n_tokens").cast(dec) * lit(1000000L)).cast("double"))
          .as("weight"))
  }

  /** WATER-FILLING token-budget allocation across strata: find the level
    * τ with Σ_s min(tokens_s, τ) ≤ budget and allocate min(tokens_s, τ)
    * to each stratum — the proportional-fair way to spend a global token
    * budget so one giant crawl source can't crowd out the tail (small
    * sources keep everything; big sources are capped at one common
    * level). Complements [[capTokensPerStratum]], which enforces a
    * PER-stratum cap the caller already knows; this op COMPUTES the cap
    * from a global budget.
    *
    * τ = max_r ⌊(budget − prefix_r) / (n − r)⌋ over the ascending-token
    * prefix (the classic water-filling closed form) — evaluated with
    * Spark's integer `div` (truncation toward zero), exact at ANY
    * budget, no 2^53 double-division cliff. Truncation differs from
    * floor only on negative numerators, and those terms are ≤ 0 under
    * both semantics while the r=0 term ⌊budget/n⌋ ≥ 0 (budget ≥ 0 is
    * required) pins the max — so τ is the textbook value. Shape: one
    * map-side-combinable per-stratum sum over the corpus, then windows
    * over the |strata|-row relation (bounded by construction — sources,
    * not documents; the single-partition window holds |strata| rows,
    * the same parallelism class as the q56 pivot). Output one row per
    * stratum: n_tokens, allocated, capped flag. */
  def waterFillBudget(df: org.apache.spark.sql.DataFrame, stratum: Column,
                      nTokens: Column, budgetTokens: Long)
    : org.apache.spark.sql.DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val totals = df.groupBy(stratum.as("stratum"))
      .agg(sum(nTokens).as("n_tokens"))
    // ascending prefix; ties broken by stratum for a deterministic walk
    // (any tie order yields the same τ — the formula only reads prefix
    // sums — but determinism keeps plans replayable)
    val w = Window.partitionBy(lit(1))
      .orderBy(col("n_tokens"), col("stratum"))
    val whole = Window.partitionBy(lit(1))
    // τ as a whole-relation window max over the SAME ranked relation —
    // one plan branch, so the corpus aggregate runs exactly once (a
    // separate τ aggregate + re-join would scan the corpus twice)
    totals
      .withColumn("_r", row_number().over(w) - 1)
      .withColumn("_prefix",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", count(lit(1)).over(whole))
      .withColumn("tau",
        max(expr(s"($budgetTokens - _prefix) div (_n - _r)")).over(whole))
      .select(col("stratum"), col("n_tokens"),
        greatest(least(col("n_tokens"), col("tau")), lit(0L)).as("allocated"),
        (col("n_tokens") > col("tau")).cast("int").as("capped"))
  }

  /** HAMILTON APPORTIONMENT of k evaluation/annotation slots across
    * strata, proportional to row counts with largest-remainder rounding:
    * every stratum gets ⌊k·n_s/N⌋ slots, the k − Σ⌊·⌋ leftover slots go
    * to the largest remainders (ties → smaller stratum). The standard
    * way to size a fixed-budget eval set so it mirrors the corpus mix
    * EXACTLY (Σ slots = k always — proportional-floor alone under-fills,
    * independent rounding drifts; when k > N a stratum's slots may
    * exceed its row count — slots are CAPACITIES, and
    * [[materializeApportioned]] caps them at the rows that exist) while
    * staying fully deterministic:
    * quotas, remainders, and ranks are all integer arithmetic (k·n_s
    * must fit a long — k ≤ 10⁶ against petabyte-scale row counts does).
    *
    * Shape: one map-side-combinable count per stratum, then windows over
    * the |strata|-row relation (the q56/q178 bounded class). */
  def apportionSlots(df: org.apache.spark.sql.DataFrame, stratum: Column,
                     k: Long): org.apache.spark.sql.DataFrame = {
    require(k >= 0, s"slot budget must be >= 0, got $k")
    import org.apache.spark.sql.expressions.Window
    val whole = Window.partitionBy(lit(1))
    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("_total", sum(col("n_rows")).over(whole))
    val quotas = counts
      .withColumn("_base", expr(s"($k * n_rows) div _total"))
      .withColumn("_rem", lit(k) * col("n_rows") % col("_total"))
      .withColumn("_leftover", lit(k) - sum(col("_base")).over(whole))
      .withColumn("_rk", row_number().over(
        whole.orderBy(col("_rem").desc, col("stratum"))))
    quotas.select(col("stratum"), col("n_rows"),
      (col("_base") + when(col("_rk") <= col("_leftover"), 1L).otherwise(0L))
        .as("slots"))
  }

  /** Materialize the [[apportionSlots]] allocation: per stratum, keep
    * exactly its apportioned slot count, chosen by the content-keyed
    * md5 rank (the q73 crawl-stable order — re-runs and corpus growth
    * do not reshuffle which rows a stratum contributes, beyond the rank
    * boundary). Output is the eval/annotation set itself: Σ rows = k
    * whenever every stratum has at least its allocation (guaranteed —
    * Hamilton never allocates above n_s... a stratum's quota exceeds
    * its count only if k > N, where the whole corpus is returned).
    *
    * Shape: the allocation relation is |strata| rows (broadcast by
    * AQE); per-stratum ranks are the q73 partitioned window. */
  def materializeApportioned(df: org.apache.spark.sql.DataFrame,
                             stratum: Column, key: Column, k: Long)
    : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val slots = apportionSlots(df, stratum, k)
      .select(col("stratum"), col("slots"))
    val ranked = df.withColumn("_s", stratum)
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("_s")).orderBy(md5(coalesce(key, lit(""))))))
    ranked.join(slots, ranked("_s") === slots("stratum"))
      .filter(col("_rk") <= col("slots"))
      .drop("_s", "_rk", "stratum", "slots")
  }

  /** LEAKAGE-SAFE split: assignment keyed by the near-dup CLUSTER
    * representative, not the document itself. [[splitBucket]] on the
    * content fingerprint already pins byte-identical copies together, but
    * NEAR-duplicates (re-crawls with boilerplate diffs, paraphrases) hash
    * to different buckets and straddle train/test — the classic silent
    * eval leak. Here every doc takes the split of its connected-component
    * representative over the supplied near-dup pair graph
    * ([[Dedup.connectedComponents]]' large/small-star output), so a whole
    * near-dup cluster lands in ONE split by construction; docs in no pair
    * are their own representative and bucket exactly as before.
    *
    * Scale: the reps relation is bounded by the DUP TAIL (docs appearing
    * in ≥1 pair), typically a few percent of the corpus — the left join
    * attaches it under AQE sizing (broadcast when it fits, shuffle when
    * not), and the split itself stays a row-local codegen'd projection.
    * Output: the input columns + `rep_id` (cluster representative, own id
    * for unpaired docs), `linked` (was in the pair graph), `split`. */
  def leakageSafeSplit(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       pairs: org.apache.spark.sql.DataFrame,
                       idA: String = "id_a", idB: String = "id_b",
                       trainPer10k: Int = 8000, valPer10k: Int = 1000)
    : org.apache.spark.sql.DataFrame = {
    val reps = Dedup.connectedComponents(pairs, idA, idB)
      .select(col("doc_id").as("__cc_id"), col("rep_id").as("__cc_rep"))
    docs.join(reps, docs(idCol).cast("long") === col("__cc_id"), "left")
      .withColumn("rep_id",
        coalesce(col("__cc_rep"), docs(idCol).cast("long")))
      .withColumn("linked", col("__cc_id").isNotNull)
      .drop("__cc_id", "__cc_rep")
      .withColumn("split",
        assignSplit(splitBucket(col("rep_id").cast("string")),
          trainPer10k, valPer10k))
  }

  /** DSIR-shaped importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every doc by
    * how target-like its HASHED-feature distribution is, with features =
    * md5₄₈(token) mod `buckets` — the same no-vocab hashing trick as the
    * q113 classifier and q126 vectorizer, so the estimator needs no
    * lookup table and no broadcast of anything unbounded.
    *
    * Exactness doctrine: DSIR's per-token log(p_target/p_raw) sum is
    * transcendental, so cross-engine bit-parity is impossible; the
    * rational surrogate here is the RATIO OF SUMS — per doc,
    * w_num = Σ_tokens (c_target[b]+1) and w_den = Σ_tokens (c_raw[b]+1)
    * (add-one smoothing), both exact BIGINTs, and the weight is their
    * ONE correctly-rounded double divide (the q106 priority doctrine).
    * Docs dense in buckets the target corpus favors score high, exactly
    * DSIR's ordering intent; what is lost vs the log form is only the
    * per-token independence weighting, not the target-likeness signal.
    *
    * Scale: the bucket-count relation is ≤ `buckets` rows (fixed, 2⁸–2²⁰)
    * — one map-side-combinable aggregate over the corpus, attached back
    * by an explicit broadcast; the per-doc fold is a second combinable
    * aggregate. Nothing grows with corpus size except the two scans.
    * Docs with no non-empty token emit no row (no features → no weight),
    * matching the other token-fold operators. Output: (pid, w_num,
    * w_den, weight). Compose with [[prioritySample]] (priority = weight
    * / content-keyed uniform) for the paper's importance RESAMPLING. */
  def dsirWeights(docs: org.apache.spark.sql.DataFrame, id: String,
                  text: String, isTarget: Column, buckets: Int = 256)
    : org.apache.spark.sql.DataFrame = {
    require(buckets >= 2, "dsirWeights needs buckets >= 2")
    // Two consumers read this exploded relation (the bucket-count
    // aggregate and the per-doc fold join), so the corpus-wide token
    // explode — the expensive scan — should run ONCE. persist(DISK_ONLY),
    // not an eager localCheckpoint (r14 advisor): a checkpoint of the
    // token relation pins O(total tokens) in executor block storage with
    // NO lineage recompute on executor loss, the heaviest possible
    // footprint for a transient intermediate; a disk-tier persist serves
    // the same two consumers, keeps recompute-on-loss, and is RELEASED
    // before this returns. The doc-sized RESULT is what gets the
    // materialization barrier (the managed-pipeline doctrine: free every
    // corpus-scale intermediate before the caller sees the plan).
    val toks = docs
      .select(col(id).as("pid"), isTarget.as("_tgt"),
        explode(split(col(text), " ")).as("_t"))
      .filter(length(col("_t")) > 0)
      .select(col("pid"), col("_tgt"),
        (TextAnalysis.md5Hash48(col("_t")) % buckets).as("_b"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val counts = toks.groupBy(col("_b"))
        .agg(count(lit(1)).as("_craw"),
          sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ctgt"))
      Dedup.truncateLineage(toks.join(broadcast(counts), "_b")
        .groupBy(col("pid"))
        .agg(sum(col("_ctgt") + 1L).as("w_num"),
          sum(col("_craw") + 1L).as("w_den"))
        .withColumn("weight",
          col("w_num").cast("double") / col("w_den").cast("double")))
    } finally toks.unpersist(blocking = false)
  }
}
