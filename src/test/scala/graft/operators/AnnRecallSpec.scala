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
}
