package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (Array[Float]).
 *
 * Two tiers:
 *  - brute-force cosine top-k (exact baseline): query-set × corpus join,
 *    ranked per query. O(|Q|·|C|·d) — fine for small query batches, and
 *    embarrassingly parallel (corpus side stays partitioned; only the small
 *    query set is broadcast).
 *  - sign-LSH bucketed top-k (scale path): bucket = sign bits of the first
 *    16 dimensions (random-hyperplane LSH with axis-aligned hyperplanes —
 *    deterministic, needs no stored projection matrix). Candidates are
 *    same-bucket only, so the join is equi on bucket and the pairwise work
 *    drops by ~2^16/corpus-skew. Recall is tunable via multi-probe /
 *    fewer bits; exactness is traded for a bounded shuffle.
 *
 * Dot products run through SQL higher-order functions (zip_with +
 * aggregate) — codegen-adjacent, no UDF serialization, and expressible in
 * the DuckDB oracle via parallel unnest.
 */
object SimilaritySearch {

  /** Sequential left-to-right dot product of two float-array columns in
    * DOUBLE (order fixed = array order, so engines agree bit-for-bit).
    * Composable higher-order-function form — interpreted per row. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the native codegen'd expression (graft.functions
    * .CosineSimilarity, registered by GraftExtensions). Bit-identical to
    * dot(a,b)/(l2norm(a)*l2norm(b)) — same widen-to-double, same
    * left-to-right accumulation — but fused into whole-stage codegen
    * instead of interpreted lambda evaluation per pair. */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Exact cosine top-k: for each query vector (small set — broadcast), rank
    * the whole corpus. Ranking key is cosine rounded to 6dp with id
    * tiebreak, keeping results deterministic across engines and runs. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qv"), col("cv")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Sign-LSH bucket id from the first `bits` dimensions (1-indexed
    * element_at; `bits` is static so this unrolls to a flat codegen'd sum). */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits)
      .map(j => when(element_at(v, j + 1) > 0f, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)

  /** Bucketed ANN: same-bucket candidates only, then exact cosine rank.
    * Lower recall than bruteForceTopK by construction; the oracle checks
    * the deterministic pipeline, SURVEY §2 records the recall trade. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      signBucket(col("embedding"), bits).as("qb"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      signBucket(col("embedding"), bits).as("cb"))
    val scored = broadcast(q)
      .join(c, col("qb") === col("cb") && col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qv"), col("cv")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF coarse centroids: per-dimension mean of each sign-bucket's
    * members. The quantizer is deliberately DETERMINISTIC (no sampled
    * k-means init): buckets come from sign bits, and each dimension's mean
    * is an order-independent DECIMAL sum cast to double — so the oracle
    * can rebuild the exact same centroids. Returns (cid, centroid). */
  def ivfCentroids(corpus: DataFrame, bits: Int): DataFrame =
    corpus
      .select(signBucket(col("embedding"), bits).as("cid"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg((sum(col("x").cast("decimal(28,10)")).cast("double") / count(lit(1))).as("c"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("centroid"))

  /** IVF top-k: rank the (few) coarse centroids per query, probe the
    * nprobe nearest inverted lists, exact cosine rank inside them. Unlike
    * lshTopK (exact-bucket-only candidates), a query near a Voronoi
    * boundary still reaches its neighbors' lists — the recall fix for the
    * axis-aligned-bucket compromise. Centroids and the probe set are
    * tiny → both broadcast; the corpus-sized list side only shuffles on
    * the equi cid key. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int, nprobe: Int): DataFrame = {
    val cents = ivfCentroids(corpus, bits)
    val lists = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      signBucket(col("embedding"), bits).as("cid"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("cid"),
        round(dot(col("qv"), col("centroid")) /
          (l2norm(col("qv")) * l2norm(col("centroid"))), 6).as("csim"))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    broadcast(probes)
      .join(lists, Seq("cid"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold — the scale
    * path. Candidates come from a sign-LSH bucket equi-join with 1-bit
    * multi-probe: side A explodes to its own bucket plus the `bits`
    * single-bit-flipped neighbors, joined to side B's exact bucket, so a
    * pair is compared iff their sign buckets are within Hamming 1. The
    * join key is high-cardinality (2^bits) — a plain hash shuffle, no
    * cross product — and each pair matches at most one probe (probe
    * buckets of A are distinct values), so no dedup pass is needed.
    * Recall is a tunable trade (more probes / fewer bits → higher recall,
    * more candidates); near-dup pairs (cosine→1) almost surely agree on
    * sign bits, which is the regime dedup cares about. For an exact
    * all-pairs scan on a bounded corpus use cosineDupPairsExact. */
  def cosineDupPairs(vectors: DataFrame, threshold: Double, bits: Int): DataFrame = {
    val v = vectors.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), bits).as("bucket"))
    val flips = array((lit(0L) +: (0 until bits).map(j => lit(1L << j))): _*)
    val a = v.select(col("vec_id").as("id_a"), col("embedding").as("va"),
        col("bucket"), explode(flips).as("flip"))
      .select(col("id_a"), col("va"), col("bucket").bitwiseXOR(col("flip")).as("pb"))
    val b = v.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      col("bucket").as("bb"))
    a.join(b, col("pb") === col("bb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Exact all-pairs cosine dup scan (O(n²) nested loop) — correct on any
    * corpus small enough to afford it; cosineDupPairs is the scale path. */
  def cosineDupPairsExact(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = vectors.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
