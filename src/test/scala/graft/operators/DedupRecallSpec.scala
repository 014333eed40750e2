package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/**
  * Quantified recall of the approximate dedup paths against their exact
  * counterparts on the driver testdata. Precision is 1.0 by construction
  * (both pipelines verify candidates exactly); recall is the designed
  * trade, so it gets measured, not hand-waved.
  */
class DedupRecallSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH recall vs exact n-gram Jaccard at threshold 0.7") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val exact = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.7))
    val lsh = pairs(Dedup.minHashLshPairs(docs, "doc_id", "text", 0.7))
    assert(lsh.subsetOf(exact)) // verified candidates: no false positives
    val recall = if (exact.isEmpty) 1.0 else (lsh & exact).size.toDouble / exact.size
    info(f"minhash-LSH recall ${recall}%.3f over ${exact.size} exact pairs")
    // 16 hashes in 4x4 bands: P(candidate | j=0.7) ~ 0.67, rising fast
    // toward 1 for stronger dups; deterministic corpus, floor below the
    // measured value
    assert(recall >= 0.5, f"recall $recall%.3f")
  }

  test("cosine sign-LSH recall vs exact all-pairs at threshold 0.4") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val exact = pairs(SimilaritySearch.cosineDupPairsExact(emb, 0.4))
    val lsh = pairs(SimilaritySearch.cosineDupPairs(emb, 0.4, bits = 6))
    assert(lsh.subsetOf(exact))
    val recall = if (exact.isEmpty) 1.0 else (lsh & exact).size.toDouble / exact.size
    info(f"cosine-LSH recall ${recall}%.3f over ${exact.size} exact pairs")
    assert(recall >= 0.2, f"recall $recall%.3f") // 0.4 is far below the
    // sign-agreement regime (cosine->1) the operator is built for; the
    // number documents the behavior at an aggressive threshold
  }
}
