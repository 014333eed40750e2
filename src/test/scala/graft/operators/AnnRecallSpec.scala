package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/**
  * Quantified recall of the approximate ANN paths against exact brute
  * force on the driver testdata — the design claim behind q48b is that
  * IVF nprobe probing recovers the recall that exact-bucket LSH loses at
  * Voronoi boundaries; this spec MEASURES it instead of asserting it in
  * prose.
  */
class AnnRecallSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def topkPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet

  test("IVF nprobe probing recalls more exact neighbors than exact-bucket LSH") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val k = 5
    val exact = topkPairs(SimilaritySearch.bruteForceTopK(queries, emb, k))
    val lsh = topkPairs(SimilaritySearch.lshTopK(queries, emb, k, bits = 4))
    val ivf = topkPairs(SimilaritySearch.ivfTopK(queries, emb, k, bits = 4, nprobe = 4))

    val lshRecall = (lsh & exact).size.toDouble / exact.size
    val ivfRecall = (ivf & exact).size.toDouble / exact.size
    info(f"recall@$k: bucket-LSH $lshRecall%.3f, IVF(nprobe=4) $ivfRecall%.3f")
    assert(ivfRecall >= lshRecall,
      f"IVF recall $ivfRecall%.3f below bucket-LSH $lshRecall%.3f")
    // deterministic corpus → deterministic values: measured 0.56 vs 0.18
    // at sf0.001 (IVF triples bucket-LSH recall); floor set below the
    // measured point to absorb nothing but a real regression
    assert(ivfRecall >= 0.5, f"IVF recall $ivfRecall%.3f")
  }

  test("int8 quantization: rank flips stay confined to near-tied neighbors") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val k = 5
    val exactDf = SimilaritySearch.bruteForceTopK(queries, emb, k)
    val exact = topkPairs(exactDf)
    val quant = topkPairs(SimilaritySearch.quantizedTopK(queries, emb, k))
    val recall = (quant & exact).size.toDouble / exact.size
    info(f"recall@$k: int8-quantized brute force $recall%.3f")
    // The symmetric global scale preserves every vector's direction, so
    // only ±0.5-code rounding perturbs similarities. Measured 0.990 at
    // sf0.001 (the per-dimension min/max quantizer this replaced scored
    // 0.63 — per-axis SHIFTS break cosine; that's why quantize() is
    // shift-free). Floor set below the measured point to absorb nothing
    // but a real regression.
    assert(recall >= 0.9, f"quantized recall $recall%.3f")

    // Quality: the TRUE cosine of every quantized pick is within eps of
    // the true k-th best for that query — substitutions are near-ties.
    val trueCos = exactDf.select(col("query_id"), col("cand_id"), col("cosine"))
    val kth = exactDf.filter(col("rank") === k)
      .select(col("query_id"), col("cosine").as("kth_cos"))
    val a = emb.select(col("vec_id").as("query_id"), col("embedding").as("qa"))
    val b = emb.select(col("vec_id").as("cand_id"), col("embedding").as("qb"))
    val picksTrue = SimilaritySearch.quantizedTopK(queries, emb, k)
      .join(a, "query_id").join(b, "cand_id")
      .select(col("query_id"),
        round(SimilaritySearch.cosine(col("qa"), col("qb")), 6).as("pick_cos"))
    val worstGap = picksTrue.join(kth, "query_id")
      .agg(max(col("kth_cos") - col("pick_cos"))).collect()(0).getDouble(0)
    info(f"worst true-cosine gap of a quantized pick vs the exact k-th best: $worstGap%.4f")
    assert(worstGap <= 0.005, f"quantized substitution gap $worstGap%.4f") // measured 0.0001
  }

  test("two-stage rerank: exact scoring over the quantized shortlist recovers at least quantized-only recall") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val k = 3
    val exact = topkPairs(SimilaritySearch.bruteForceTopK(queries, emb, k))
    val quantOnly = topkPairs(SimilaritySearch.quantizedTopK(queries, emb, k))
    val reranked = topkPairs(SimilaritySearch.rerankTopK(queries, emb, 10, k))
    val qRecall = (quantOnly & exact).size.toDouble / exact.size
    val rRecall = (reranked & exact).size.toDouble / exact.size
    info(f"recall@$k: quantized-only $qRecall%.3f, shortlist-10 rerank $rRecall%.3f")
    // The rerank's misses are exactly the true neighbors the shortlist
    // dropped; with S=10 ≫ k=3 the coarse scorer only has to get the
    // top-3 into its top-10 — a far weaker ask than ranking them 1-2-3.
    assert(rRecall >= qRecall,
      f"rerank recall $rRecall%.3f below quantized-only $qRecall%.3f")
    assert(rRecall >= 0.95, f"rerank recall $rRecall%.3f") // measured at sf0.001
  }
}
