package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHashing._

/**
 * Document deduplication operators for large-scale corpus curation: exact
 * (hash-groupBy), exact n-gram Jaccard (bounded candidate sets), MinHash+LSH
 * (the scale path: shingle → 16-way minhash signature → 4×4 banding →
 * bucket join → exact-Jaccard verify on candidates only), and SimHash
 * (64→32-bit sign sketch + Hamming pairing).
 *
 * Scale design: every operator is a pure DataFrame pipeline whose joins key
 * on hash/bucket values — at 100 TB each stage is a shuffle on a
 * high-cardinality key with no driver-side state. The LSH bucket join is
 * the only pairwise step, and it only materializes same-bucket candidate
 * pairs (collision probability tuned by bands×rows), not the O(n²) cross
 * product that exact Jaccard would need.
 */
object Dedup {

  /** Exact dedup: group identical texts (by md5 + length to keep the
    * group key narrow), keep min doc id — the Spark-native analog of a
    * hash-based DISTINCT at corpus scale. */
  def exactDuplicates(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(md5(col(text)).as("text_md5"), length(col(text)).as("text_len"))
      .agg(
        min(col(id)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** (id, gram) distinct shingle relation — the shared input of the
    * Jaccard-family operators. */
  def shingleSet(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).as("sid"), explode(array_distinct(shingles3(col(text)))).as("g"))

  /** Exact 3-gram Jaccard similarity for all pairs sharing at least one
    * shingle, thresholded. O(sum over grams of df²) — use only on bounded
    * candidate sets (the `filter` arg); MinHash-LSH below is the scale path. */
  def ngramJaccardPairs(docs: DataFrame, id: String, text: String, threshold: Double): DataFrame = {
    val sh = shingleSet(docs, id, text).cache()
    val sizes = sh.groupBy(col("sid")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.g") === col("b.g") && col("a.sid") < col("b.sid"))
      .groupBy(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.sid"))
      .join(sizes.as("sb"), col("id_b") === col("sb.sid"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 16-hash MinHash signature per document: one shuffle (groupBy id) with
    * 16 min-aggregates — partial aggregation makes this map-side cheap. */
  def minHashSignatures(docs: DataFrame, id: String, text: String): DataFrame = {
    val h = shingleSet(docs, id, text).withColumn("h", gramHash(col("g")))
    val aggs = MinHashParams.indices.map(j => min(minHashJ(col("h"), j)).as(s"m$j"))
    h.groupBy(col("sid")).agg(aggs.head, aggs.tail: _*)
  }

  /** Candidate pairs from LSH banding over the signature (NumBands bands of
    * RowsPerBand hashes each): same band signature → candidate. */
  def lshCandidates(signatures: DataFrame): DataFrame = {
    val bands = (0 until NumBands).map { b =>
      val sig = concat_ws("-",
        (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}")): _*)
      struct(lit(b).as("band"), sig.as("sig"))
    }
    val exploded = signatures
      .select(col("sid"), explode(array(bands: _*)).as("bs"))
      .select(col("sid"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    exploded.as("x")
      .join(exploded.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.sid") < col("y.sid"))
      .select(col("x.sid").as("id_a"), col("y.sid").as("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: candidates from banding, then
    * exact Jaccard verification restricted to candidates.
    *
    * Verification keeps each doc's distinct shingles as ONE array row and
    * computes |A∩B| with array_intersect in-row. The explode-and-join
    * formulation (candidates ⋈ shingles ⋈ shingles) multiplies every
    * candidate pair by its shingle count before the second join — ~400×
    * the rows for ~zero information; on the shared-vocab sf0.1 corpus that
    * was 208 s vs ~4 s for this shape. The shingle-array side is
    * docs-sized (not pairs-sized), so it broadcasts, and the candidate
    * pairs never shuffle at all. */
  def minHashLshPairs(docs: DataFrame, id: String, text: String, threshold: Double): DataFrame =
    minHashLshPairs(docs, id, text, threshold, BroadcastVerifyMaxBytes)

  def minHashLshPairs(docs: DataFrame, id: String, text: String, threshold: Double,
                      broadcastBudgetBytes: Long): DataFrame = {
    // localCheckpoint barriers between stages, twice over:
    // (a) the band self-join consumes the signature subplan on BOTH sides —
    //     without a barrier the whole shingle→minhash pipeline executes
    //     twice;
    // (b) Catalyst pushes the jaccard threshold down into the verify join's
    //     condition, where the alias substitution re-expands `inter` and
    //     evaluates array_intersect three times per candidate pair.
    //     Materializing the scored pairs keeps it at exactly once.
    // Net effect at sf0.1 (5k docs, 2.46M candidates): ~20 s vs ~205 s
    // fused. This is the same role the reference's CacheMachines play
    // between kernels (docsrc/source/engine/caches.rst).
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = minHashSignatures(docs, id, text).localCheckpoint()
    val cands = lshCandidates(sigs).localCheckpoint()
    // gramHash is injective, so set ops on hash arrays equal set ops on the
    // gram strings; sorted-distinct arrays let the intersection run as a
    // linear merge instead of array_intersect's per-row hash build — the
    // verify step's hot loop.
    val sets = docs.select(col(id).as("sid"),
      sort_array(array_distinct(transform(shingles3(col(text)), g => gramHash(g)))).as("gs"))
      .localCheckpoint()
    val integralId = docs.schema(id).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    // Broadcast eligibility is decided on ESTIMATED BYTES, not doc count —
    // 8 B per distinct gram hash + fixed per-entry map overhead. A doc-count
    // gate would mis-fire in both directions (many tiny docs: needless
    // fallback; few huge docs: broadcast OOM). Same decision rule as the
    // reference's scatter-vs-shuffle join budget
    // (engine/src/execution_kernels/BatchJoinProcessing.cpp:672-830, which
    // compares estimated bytes against MAX_JOIN_SCATTER_MEM_OVERHEAD).
    val sizing = sets.agg(count(lit(1)), sum(size(col("gs")))).collect()(0)
    val nDocs = sizing.getLong(0)
    val nGrams = if (sizing.isNullAt(1)) 0L else sizing.getLong(1)
    val estBytes = nGrams * 8L + nDocs * 64L
    val useBroadcastMap = integralId && estBytes <= broadcastBudgetBytes
    minHashVerify(cands, sets, useBroadcastMap).localCheckpoint()
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Verify stage of minHashLshPairs: intersect sizes for each candidate
    * pair. Two physical strategies with identical output (both run the same
    * sorted-merge walk):
    *  - useBroadcastMap: ship the whole gram-set map to executors as one
    *    Spark broadcast and score pairs in a single mapPartitions pass —
    *    no per-pair array materialization through join outputs. Only legal
    *    under the broadcast byte budget.
    *  - otherwise: two shuffle-hash joins of candidates against `sets`
    *    keyed on id — both shuffles move candidate-sized data and the hash
    *    table per partition is 1/N of the doc side, so nothing needs to fit
    *    on one node. SHUFFLE_HASH pins `sets` as the build side and keeps
    *    AQE from re-broadcasting what the budget just ruled out. */
  def minHashVerify(cands: DataFrame, sets: DataFrame, useBroadcastMap: Boolean): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    if (useBroadcastMap) {
      // getAs[Number]: integralId admits IntegerType ids too, so the sid
      // cell may be an Int — a raw getLong would ClassCastException.
      val setsMap: Map[Long, Array[Long]] = sets.collect()
        .map(r => r.getAs[Number](0).longValue -> r.getSeq[Long](1).toArray).toMap
      val bc = spark.sparkContext.broadcast(setsMap)
      cands.select(col("id_a").cast("long"), col("id_b").cast("long")).as[(Long, Long)]
        .mapPartitions { it =>
          val m = bc.value
          it.map { case (a, b) =>
            val ga = m(a); val gb = m(b)
            var i = 0; var j = 0; var n = 0
            while (i < ga.length && j < gb.length) {
              if (ga(i) == gb(j)) { n += 1; i += 1; j += 1 }
              else if (ga(i) < gb(j)) i += 1
              else j += 1
            }
            (a, b, n, ga.length, gb.length)
          }
        }
        .toDF("id_a", "id_b", "inter", "na", "nb")
    } else {
      cands
        .join(sets.as("sa").hint("SHUFFLE_HASH"), col("id_a") === col("sa.sid"))
        .join(sets.as("sb").hint("SHUFFLE_HASH"), col("id_b") === col("sb.sid"))
        .select(col("id_a"), col("id_b"),
          call_function("graft_sorted_intersect_count", col("sa.gs"), col("sb.gs")).as("inter"),
          size(col("sa.gs")).as("na"), size(col("sb.gs")).as("nb"))
    }
  }

  /** Byte ceiling for the broadcast-map verify fast path — the reference's
    * 500 MB scatter budget (MAX_JOIN_SCATTER_MEM_OVERHEAD,
    * engine/src/execution_kernels/BatchJoinProcessing.cpp), minus headroom
    * for the driver hop: the map is collected once before re-broadcast. */
  val BroadcastVerifyMaxBytes: Long = 300L * 1024 * 1024

  /** 32-bit SimHash fingerprint per document over whitespace tokens. */
  def simHashFingerprints(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = docs.select(col(id).as("sid"), explode(split(col(text), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .withColumn("h", tokenHash(col("t")))
    val bits = toks.select(col("sid"), col("h"),
      explode(sequence(lit(0), lit(31))).as("bit"))
    bits
      .groupBy(col("sid"), col("bit"))
      .agg(sum(when(expr("(shiftright(h, bit) & 1)") === 1, 1).otherwise(-1)).as("s"))
      .groupBy(col("sid"))
      .agg(sum(when(col("s") > 0, pow(lit(2.0), col("bit")).cast("long"))
        .otherwise(0L)).as("fingerprint"))
  }

  /** SimHash near-dup pairs: Hamming distance over fingerprints ≤ maxDist,
    * found by BANDING rather than all-pairs comparison. Pigeonhole: split
    * the 32-bit fingerprint into maxDist+1 disjoint bit bands — any pair
    * within Hamming maxDist has its differing bits in at most maxDist
    * bands, so it matches EXACTLY in at least one band. Candidate
    * generation is therefore an equi self-join on (band, band_bits) —
    * a hash shuffle on a high-cardinality key, never a cross product —
    * and the exact Hamming check runs on candidates only. Output is
    * identical to the naive all-pairs formulation (the banding is a
    * complete cover, not an approximation). */
  def simHashPairs(fingerprints: DataFrame, maxDist: Int): DataFrame = {
    // nBands > 32 would give width = 0: every row masks to a constant
    // (band, 0) key — a degenerate single-bucket cross join.
    require(maxDist >= 0 && maxDist < 32, s"maxDist must be in [0, 32), got $maxDist")
    val nBands = maxDist + 1
    val width = 32 / nBands
    val bands = (0 until nBands).map { b =>
      val lo = b * width
      val w = if (b == nBands - 1) 32 - lo else width
      struct(lit(b).as("band"),
        shiftright(col("fingerprint"), lo).bitwiseAND(lit((1L << w) - 1)).as("bits"))
    }
    val exploded = fingerprints
      .select(col("sid"), col("fingerprint"), explode(array(bands: _*)).as("bb"))
      .select(col("sid"), col("fingerprint"), col("bb.band").as("band"), col("bb.bits").as("bits"))
    exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.sid") < col("b.sid"))
      // a Hamming-0 pair collides in every band — dedupe candidates
      .select(col("a.sid").as("id_a"), col("b.sid").as("id_b"),
        col("a.fingerprint").as("fa"), col("b.fingerprint").as("fb"))
      .distinct()
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
