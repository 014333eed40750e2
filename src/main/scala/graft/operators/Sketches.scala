package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.r6

/**
 * KMV (k-minimum-values) bottom-k sketches for distinct-set similarity
 * across corpus partitions (Bar-Yossef et al. 2002; Beyer et al. 2007
 * "On synopses for distinct-value estimation under multiset operations").
 *
 * The 100 TB use: q88's exact cross-source overlap matrix ships every
 * distinct (source, gram) pair through a shuffle — exact, but the
 * exchange grows with the corpus. The KMV form reduces each source to
 * its k SMALLEST distinct gram hashes: a fixed k·8-byte synopsis per
 * source, after which every pairwise set operation (union, intersection,
 * Jaccard) is row-local arithmetic over two tiny sorted arrays. Sketches
 * are mergeable (bottom-k of a union = bottom-k of the concatenation),
 * so partial aggregation bounds what reaches the exchange.
 *
 * Portability doctrine (TextAnalysis.md5Hash48 / q100 HLL): the hash is
 * an md5 hex parse both engines share, bottom-k is an integer
 * row_number, and the only float op is the final division — so the
 * DuckDB oracle rebuilds every sketch and every estimate bit-for-bit.
 * Accuracy is the documented KMV property (±1/√(k−1) relative error on
 * union sizes); the EXACT pairwise Jaccard rides along as evidence, the
 * q100 pattern — it is the branch that stops scaling, the estimate
 * branch is the one that ships.
 */
object Sketches {

  /** Per-group bottom-k sketch over a token column: the k smallest
    * DISTINCT md5-48 hashes, as a sorted array, plus the group's exact
    * distinct count (evidence column — the non-scaling branch).
    *
    * The bottom-k itself is one rank window per group over the distinct
    * (group, hash) pairs. A static hash prefilter (`h < 2^48 / prune`)
    * can cut the exchange when groups are known to be large (kth-min
    * ≪ threshold); it is OFF by default because its validity condition
    * (every group has ≥ k hashes under the threshold) is data-dependent —
    * callers at scale enable it and the emitted `kth_min` column makes a
    * violation visible (kth_min at the threshold ⇒ sketch truncated). */
  def kmvSketch(df: DataFrame, group: Column, token: Column, k: Int = 64,
                pruneFactor: Long = 1L): DataFrame =
    kmvHashSketch(
      df.select(group.as("g"), TextAnalysis.md5Hash48(token).as("h")),
      col("g"), col("h"), k, pruneFactor)

  /** kmvSketch over an already-hashed long column (callers holding md5
    * fingerprints parse them with TextAnalysis.hex48 — one md5, not two). */
  def kmvHashSketch(df: DataFrame, group: Column, hash: Column, k: Int = 64,
                    pruneFactor: Long = 1L): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    require(pruneFactor >= 1L, "pruneFactor must be >= 1")
    val threshold = (1L << 48) / pruneFactor
    val hashed = df
      .select(group.as("g"), hash.as("h"))
      .filter(col("h") < threshold)
      .distinct()
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("g"))
      .agg(sort_array(collect_list(col("h"))).as("hs"),
        max(when(col("rn") === k, col("h"))).as("kth_min"))
  }

  /** Histogram-based approximate percentiles over an integer column —
    * the bounded-state synopsis answering what q97's exact integer-rank
    * report answers with a full per-group sort window. The histogram is
    * `bins` counters per group (mergeable, map-side combinable — the HLL
    * argument again), so the exchange carries ≤ bins rows per group no
    * matter the corpus; the estimate returns the LOWER EDGE of the first
    * bin whose cumulative count reaches ceil(q·n) — error bounded by one
    * bin width, arithmetic all-integer (width = (max−min) div bins + 1,
    * the q97 ceil-div convention), so the oracle matches bit-for-bit.
    * Needs one extra pass for per-group min/max/count (a tiny aggregate
    * joined back; AQE broadcasts it when groups are few). t-digest/GK
    * sketches would bound error tighter per byte but their merge state
    * is engine-private — unverifiable, the approx_count_distinct
    * situation q100 documents. */
  def histogramQuantiles(df: DataFrame, group: Column, value: Column,
                         bins: Int = 32): DataFrame = {
    require(bins >= 2, "histogramQuantiles needs bins >= 2")
    val vals = df.select(group.as("g"), value.cast("long").as("v"))
    // Spark `/` on integers is a DOUBLE divide (the q97 lesson); `div` is
    // the integral one — every division below is expr-spelled div.
    val stats = vals.groupBy(col("g"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("n"))
      .withColumn("width", expr(s"(mx - mn) div $bins + 1"))
    val hist = vals.join(stats, "g")
      .withColumn("bin", expr("(v - mn) div width"))
      .groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("c"),
        first(col("mn")).as("mn"), first(col("width")).as("width"),
        first(col("n")).as("n"))
    val w = Window.partitionBy(col("g")).orderBy(col("bin"))
    hist
      .withColumn("cum", sum(col("c")).over(w))
      .groupBy(col("g"))
      .agg(first(col("n")).as("n_rows"), first(col("width")).as("bin_width"),
        (first(col("mn")) + first(col("width")) *
          min(when(col("cum") >= expr("(n + 1) div 2"), col("bin")))).as("p50_est"),
        (first(col("mn")) + first(col("width")) *
          min(when(col("cum") >= expr("(n * 9 + 9) div 10"), col("bin")))).as("p90_est"))
  }

  /** Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005) over
    * a token stream: `depth` hash rows × `width` counters, built as ONE
    * (row, cell) grouped count — mergeable, map-side combinable, so the
    * exchange carries ≤ depth·width rows no matter the corpus (the
    * q100/q108 bounded-state argument, this time for FREQUENCY rather
    * than cardinality). Point estimate for a token = min over its depth
    * cells — an overestimate only (one-sided error ≤ εN with ε = e/width
    * at the usual depth=⌈ln 1/δ⌉), which is the property that makes CMS
    * the standard vocabulary / stopword / heavy-hitter pass over a
    * 100 TB token stream.
    *
    * Hash family: the 32 hex chars of ONE md5 are four disjoint 8-char
    * slices, each parsed as a 32-bit integer (hexParse) and reduced
    * mod width — independent-enough rows from a single strong mixer,
    * and bit-reproducible in DuckDB, so the oracle rebuilds every
    * counter and every min. The EXACT top-k candidate list (full token
    * groupBy + one global rank window) is the evidence branch that
    * stops scaling — at 100 TB candidates come from per-partition local
    * top-k or a prior round's sketch instead; the sketch build and the
    * min-estimate probe are the branches that ship. */
  def cmsHeavyHitters(df: DataFrame, token: Column, depth: Int = 4,
                      width: Int = 512, topK: Int = 20): DataFrame = {
    require(depth >= 1 && depth <= 4, "cmsHeavyHitters: depth must be 1..4 (md5 has 4 slices)")
    require(width >= 2, "cmsHeavyHitters: width must be >= 2")
    def cellsOf(hx: Column): Column = array((0 until depth).map(j =>
      TextAnalysis.hexParse(hx, 1 + 8 * j, 8) % width): _*)

    val toks = df.select(token.as("tok"), md5(token).as("hx"))
    val sketch = toks
      .select(posexplode(cellsOf(col("hx"))).as(Seq("j", "cell")))
      .groupBy(col("j"), col("cell"))
      .agg(count(lit(1)).as("c"))

    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val w = Window.orderBy(col("n_exact").desc, col("tok"))
    val cand = exact
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)

    // candidate side is ≤ topK rows after the rank filter — broadcast by
    // construction; the sketch side is ≤ depth·width rows, also tiny.
    cand
      .select(col("tok"), col("n_exact"), col("rank"),
        posexplode(cellsOf(md5(col("tok")))).as(Seq("j", "cell")))
      .join(sketch, Seq("j", "cell"))
      .groupBy(col("tok"), col("n_exact"), col("rank"))
      .agg(min(col("c")).as("cms_estimate"))
  }

  /** Cross-source similarity matrix from KMV sketches: for every source
    * pair, the bottom-k union sketch K, the members of K present in BOTH
    * source sketches K∩, and the Jaccard estimate K∩/|K| — next to the
    * exact Jaccard over the full distinct-hash sets (evidence).
    *
    * The pair stage is |sources|² over k-length arrays — row-local
    * array_sort/array_intersect, no shuffle beyond the sketch build.
    * Tokenization is the q88/q72 token n-gram (space-joined windows),
    * giving the sketch the same unit as the exact overlap audit. */
  def kmvSourceSimilarity(docs: DataFrame, source: String, text: String,
                          n: Int = 2, k: Int = 64): DataFrame = {
    val grams = docs
      .select(col(source).as("src"), split(col(text), " ").as("_ts"))
      .select(col("src"),
        explode(Decontamination.tokenGramFingerprintsFromTokens(col("_ts"), n)).as("fp"))
      .select(col("src"), TextAnalysis.hex48(col("fp")).as("h"))
    val sk = kmvHashSketch(grams, col("src"), col("h"), k)
      .select(col("g"), col("hs"))
    val exact = grams.select(col("src").as("g"), col("h")).distinct()

    val a = sk.select(col("g").as("src_a"), col("hs").as("ha"))
    val b = sk.select(col("g").as("src_b"), col("hs").as("hb"))
    val paired = a.join(b, col("src_a") < col("src_b"))
      .withColumn("un", slice(array_sort(array_union(col("ha"), col("hb"))), 1, k))
      .withColumn("k_union", size(col("un")))
      .withColumn("k_inter",
        size(array_intersect(array_intersect(col("un"), col("ha")), col("hb"))))
      .select(col("src_a"), col("src_b"), col("k_union"), col("k_inter"),
        r6(col("k_inter").cast("double") / col("k_union").cast("double"))
          .as("jaccard_est"))

    val ex = exact.select(col("g").as("xa"), col("h"))
      .join(exact.select(col("g").as("xb"), col("h")), Seq("h"))
      .filter(col("xa") < col("xb"))
      .groupBy(col("xa"), col("xb")).agg(count(lit(1)).as("n_inter"))
    val sizes = exact.groupBy(col("g")).agg(count(lit(1)).as("n"))
    // ex and sizes aggregate down to ≤|S|² / |S| rows — bounded by the
    // source-pair matrix the operator emits anyway, so broadcasting them
    // is safe by construction (a corpus-sized SMJ here would be a plan
    // regression; PlanAuditSpec pins it)
    paired
      .join(broadcast(ex),
        col("src_a") === col("xa") && col("src_b") === col("xb"), "left")
      .join(broadcast(sizes.select(col("g"), col("n").as("na"))),
        col("src_a") === col("g"))
      .drop("g")
      .join(broadcast(sizes.select(col("g"), col("n").as("nb"))),
        col("src_b") === col("g"))
      .select(col("src_a"), col("src_b"), col("k_union"), col("k_inter"),
        col("jaccard_est"),
        r6(coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("n_inter"), lit(0L))).cast("double"))
          .as("jaccard_exact"))
  }
}
