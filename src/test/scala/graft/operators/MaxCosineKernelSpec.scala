package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * graft_max_r6_cosine (the mmrSelect kernel: one array<array<float>>
  * argument, O(k) inside one codegen'd call) must be value-identical to
  * the composable greatest(r6(cos(e, s1)), …, r6(cos(e, sk))) chain it
  * replaced — on real embeddings, degenerate vectors, and a large k
  * where the chain's O(k²) plan compile was the point of the kernel.
  */
class MaxCosineKernelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  import graft.Tables.r6

  private def composable(selected: Seq[Seq[Float]]) =
    selected.map(v =>
      r6(SimilaritySearch.cosine(col("embedding"), typedLit(v))))
      .reduce(greatest(_, _))

  private def kernel(selected: Seq[Seq[Float]]) =
    call_function("graft_max_r6_cosine", col("embedding"), typedLit(selected))

  test("matches the composable greatest-of-r6-cosines chain on real embeddings") {
    val emb = graft.Tables.load(spark, TestSpark.sfDir, "embeddings")
    val selected = emb.orderBy(col("vec_id")).limit(7).collect()
      .map(_.getSeq[Float](1).toSeq).toSeq
    val both = emb.select(col("vec_id"),
        kernel(selected).as("k"), composable(selected).as("c"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0,
        s"vec ${r.getLong(0)}: kernel ${r.getDouble(1)} vs chain ${r.getDouble(2)}")
    }
  }

  test("matches at k = 200 (the regime the chain could not compile cheaply)") {
    val emb = graft.Tables.load(spark, TestSpark.sfDir, "embeddings")
    val selected = emb.orderBy(col("vec_id")).limit(200).collect()
      .map(_.getSeq[Float](1).toSeq).toSeq
    // chain at k = 200 still EVALUATES correctly (it was compile cost,
    // not wrongness, that motivated the kernel) — sample 50 rows
    val sample = emb.filter(col("vec_id") % 40 === 0)
    val both = sample.select(kernel(selected).as("k"),
      composable(selected).as("c")).collect()
    assert(both.nonEmpty)
    both.foreach(r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0))
  }

  test("degenerate vectors: zero vector (NaN cosine) and single-row set propagate identically") {
    val rows = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f)),           // zero vector -> NaN cosine
      (2L, Seq(1.0f, 0.0f, 0.0f)),
      (3L, Seq(-1.0f, 2.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val sel = Seq(Seq(1.0f, 1.0f, 0.0f))
    val both = rows.select(col("vec_id"), kernel(sel).as("k"),
      r6(SimilaritySearch.cosine(col("embedding"), typedLit(sel.head))).as("c"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0,
        s"vec ${r.getLong(0)}")
    }
  }

  test("mmrSelect over the kernel: deterministic coverage-first selection unchanged") {
    val emb = graft.Tables.load(spark, TestSpark.sfDir, "embeddings")
      .limit(64)
      .withColumn("rel", graft.Tables.r6(lit(1.0) / (col("vec_id") + 1)))
    val out = SimilaritySearch.mmrSelect(emb, 8).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(out.length == 8)
    assert(out.map(_._1).toSeq == (1 to 8))
    assert(out.map(_._2).distinct.length == 8)
    // first pick is max relevance = smallest vec_id under this rel
    assert(out.head._2 == 0L)
  }
}
