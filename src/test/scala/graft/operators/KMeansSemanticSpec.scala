package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * K-means assignment (deterministic sign-bucket init + Lloyd refinement)
  * and SemDeDup-style within-cluster semantic dedup. Cross-engine value
  * parity is pinned by the q84/q85 DuckDB oracles, which replay the whole
  * optimization; these specs pin the operator PROPERTIES — partition
  * totality, geometric sanity of the clusters, the greedy survivor
  * contract, and determinism.
  */
class KMeansSemanticSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Two well-separated groups in 4-dim: signs of dim 0 split them at init
  // (bits=1), refinement has nothing to undo. A near-duplicate of id 10
  // rides along as id 11 for the dedup tests.
  private def corpus = Seq(
    (10L, Array(1.0f, 1.0f, 0.1f, 0.0f)),
    (11L, Array(0.99f, 1.01f, 0.1f, 0.0f)),   // near-dup of 10 (cos ≈ 1)
    (12L, Array(0.8f, 1.2f, 0.3f, 0.1f)),
    (20L, Array(-1.0f, -1.0f, 0.1f, 0.0f)),
    (21L, Array(-0.9f, -1.1f, 0.2f, 0.1f)),
    (22L, Array(-1.2f, -0.8f, 0.0f, 0.2f))
  ).toDF("vec_id", "embedding")

  test("kmeansAssign is a total partition that separates the two groups") {
    val out = SimilaritySearch.kmeansAssign(corpus, 1, 2)
      .select("vec_id", "cid", "csim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 6)                       // every vector, exactly once
    assert(out.map(_._1).toSet == Set(10L, 11L, 12L, 20L, 21L, 22L))
    val byCid = out.groupBy(_._2)
    assert(byCid.size == 2)
    // groups land in different clusters, intact
    val g1 = out.filter(t => t._1 < 20).map(_._2).toSet
    val g2 = out.filter(t => t._1 >= 20).map(_._2).toSet
    assert(g1.size == 1 && g2.size == 1 && g1 != g2)
    // members sit near their own centroid: cosine to it is high
    assert(out.forall(_._3 > 0.9))
  }

  test("kmeansAssign is deterministic across runs") {
    def run() = SimilaritySearch.kmeansAssign(corpus, 1, 1)
      .select("vec_id", "cid", "csim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run() == run())
  }

  test("semanticDedup drops exactly the larger-id member of a near-dup pair") {
    val kept = SimilaritySearch.semanticDedup(corpus, 1, 1, 0.995)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 12L, 20L, 21L, 22L)) // 11 gone: dup of smaller 10
  }

  test("semanticDedup with an unreachable threshold is the identity") {
    val kept = SimilaritySearch.semanticDedup(corpus, 1, 1, 1.1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 11L, 12L, 20L, 21L, 22L))
  }

  test("survivor rule matches the pair-local greedy contract on real data") {
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .select("vec_id", "embedding")
    val assigned = SimilaritySearch.kmeansAssign(emb, 4, 1)
      .select("vec_id", "embedding", "cid")
    val kept = SimilaritySearch.semanticDedup(emb, 4, 1, 0.4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // recompute the contract directly: dropped iff some smaller-id member
    // of the same cluster is >= threshold rounded cosine
    val a = assigned.select(col("cid"), col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = assigned.select(col("cid"), col("vec_id").as("id_b"), col("embedding").as("vb"))
    val expectedDropped = a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(SimilaritySearch.cosine(col("va"), col("vb")), 6) >= 0.4)
      .select("id_b").distinct().collect().map(_.getLong(0)).toSet
    val all = assigned.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == all -- expectedDropped)
    assert(expectedDropped.nonEmpty) // the threshold actually bites at this SF
  }
}
