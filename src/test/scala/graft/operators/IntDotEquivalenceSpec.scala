package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * graft_qdot (codegen'd integer dot kernel) must be value-identical to
  * the composable aggregate(zip_with(...)) form it replaces in
  * quantizedTopK's pair loop — including the HOF's null algebra: unequal
  * lengths (zip_with pads with null) and null elements both yield NULL,
  * never a partial sum.
  */
class IntDotEquivalenceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def both(rows: Seq[(Array[Int], Array[Int])]): (Seq[Any], Seq[Any]) = {
    val df = rows.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("id", "a", "b")
    val out = df.select(col("id"),
        SimilaritySearch.qdot(col("a"), col("b")).as("k"),
        SimilaritySearch.qdotHof(col("a"), col("b")).as("h"))
      .orderBy("id").collect()
    (out.map(r => if (r.isNullAt(1)) null else r.getLong(1)).toSeq,
     out.map(r => if (r.isNullAt(2)) null else r.getLong(2)).toSeq)
  }

  test("matches the HOF form on random code arrays, incl. extreme values") {
    val elem = Gen.oneOf(Gen.choose(-127, 127), Gen.oneOf(Int.MinValue, Int.MaxValue, 0))
    val arr = Gen.choose(0, 80).flatMap(n => Gen.listOfN(n, elem).map(_.toArray))
    val rowsGen = Gen.listOfN(40, Gen.zip(arr, arr))
    // fixed seeds (SemanticsPropertySpec pattern): deterministic CI, 5×40 cases
    val rows = (1L to 5L).flatMap(s => rowsGen(Gen.Parameters.default, Seed(s)).get)
    val (k, h) = both(rows)
    assert(k.nonEmpty && k == h)
  }

  test("unequal lengths yield NULL on both forms (zip_with null padding)") {
    val (k, h) = both(Seq(
      (Array(1, 2, 3), Array(1, 2)),
      (Array.empty[Int], Array(5)),
      (Array(4), Array.empty[Int]),
      (Array.empty[Int], Array.empty[Int]), // both empty → 0, not null
      (Array(2, 3), Array(2, 3))))
    assert(k == h)
    assert(k == Seq(null, null, null, 0L, 13L))
  }

  test("on the embeddings corpus the kernel reproduces every pair dot") {
    val emb = graft.Tables.load(spark, TestSpark.sfDir, "embeddings")
    val coded = SimilaritySearch.quantize(emb.select(col("vec_id"), col("embedding")))
    val q = coded.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("qv").as("qa"))
    val pairs = q.crossJoin(coded.select(col("vec_id").as("cid"), col("qv").as("qb")))
      .select(col("qid"), col("cid"),
        SimilaritySearch.qdot(col("qa"), col("qb")).as("k"),
        SimilaritySearch.qdotHof(col("qa"), col("qb")).as("h"))
    assert(pairs.count() > 0)
    assert(pairs.filter(not(col("k") <=> col("h"))).count() == 0)
  }
}
