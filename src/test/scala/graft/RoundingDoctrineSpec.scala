package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilaritySearch

/** Pins the SIGNED-ZERO side of the drnd rounding doctrine (Tables.drnd
  * scaladoc): Spark's BigDecimal round has no negative zero, so drnd of a
  * negative value that rounds to zero must emit +0.0 — bit pattern 0L —
  * while DuckDB's C round leaves -0.0 there, which the oracle side
  * normalizes with `+ 0.0` (IEEE -0.0 + 0.0 = +0.0). The r9 q154 failure
  * mode: one covariance cell whose true value rounded to zero from below
  * hashed differently across engines while float-comparing equal. */
class RoundingDoctrineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("drnd of a negative tiny emits POSITIVE zero (bit pattern 0)") {
    val r = Seq(-1e-9, -4.9e-7, -0.0, 0.0, 1e-9)
      .toDF("x").select(Tables.r6(col("x")).as("r")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) == 0.0)
      assert(bits(row.getDouble(0)) == 0L,
        s"drnd emitted -0.0 (bits ${bits(row.getDouble(0))})")
    }
  }

  test("drnd half-away-from-zero keeps negative NONZERO results negative") {
    val r = Seq((-1.5e-6, -2e-6), (-5e-7, -1e-6), (-1.4e-6, -1e-6))
      .toDF("x", "want").select(Tables.r6(col("x")).as("r"), col("want"))
      .collect()
    r.foreach { row =>
      assert(bits(row.getDouble(0)) == bits(row.getDouble(1)),
        s"drnd(${row.getDouble(0)}) != ${row.getDouble(1)}")
    }
  }

  test("oracle-side normalization identity: -0.0 + 0.0 = +0.0, x + 0.0 = x") {
    val r = spark.sql(
      "SELECT (CAST('-0.0' AS DOUBLE)) + 0.0D, -2e-6D + 0.0D, 3.5D + 0.0D")
      .collect()(0)
    assert(bits(r.getDouble(0)) == 0L)
    assert(bits(r.getDouble(1)) == bits(-2e-6))
    assert(bits(r.getDouble(2)) == bits(3.5))
  }

  test("planted negative-tiny covariance cell lands as +0.0 through " +
    "embeddingCovariance") {
    // micro-units [0,1] and [1,0]: cov(0,1) = (n·Σxy − ΣxΣy)/n² = −0.25
    // micro² → −2.5e-13 raw → rounds to zero FROM BELOW (the q154 class)
    val df = Seq(Array(0f, 1e-6f), Array(1e-6f, 0f)).toDF("embedding")
    val out = SimilaritySearch.embeddingCovariance(df, "embedding")
      .filter(col("i") === 0 && col("j") === 1).collect()
    assert(out.length == 1)
    assert(out(0).getDouble(2) == 0.0)
    assert(bits(out(0).getDouble(2)) == 0L, "covariance cell emitted -0.0")
  }

  test("negative-capable oracles carry the + 0.0 signed-zero suffix") {
    val o = SparkEntry.oracleSql
    assert(o("q154_embed_cov").contains("/1000000.0 + 0.0"))
    assert(o("q153_classifier_kappa").contains("/1000000.0 + 0.0"))
    for (q <- Seq("q47_ann_topk", "q48_ann_lsh", "q48b_ann_ivf"))
      assert(o(q).contains("round(dot/(nq*nc), 6) + 0.0"), q)
    assert(o("q86_ann_quantized").contains(", 6) + 0.0"))
    assert(o("q117_ann_rerank").contains(", 6) + 0.0"))
    assert(o("q135_hard_negatives").contains("/ 1000000.0 + 0.0"))
    assert(o("q23_math_funcs").contains("round(sin(l_quantity), 6) + 0.0"))
  }

  test("embeddingCovariance rejects mixed vector lengths loudly") {
    val mixed = Seq(Array(1f, 2f, 3f), Array(1f, 2f)).toDF("embedding")
    val ex = intercept[Exception] {
      SimilaritySearch.embeddingCovariance(mixed, "embedding").collect()
    }
    assert(ex.getMessage != null)
  }

  test("PQ ops reject a dimension not divisible by m") {
    val v = Seq((0L, Array.fill(6)(1f)), (1L, Array.fill(6)(2f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      SimilaritySearch.pqCodebooks(v, m = 4, signBits = 2).collect()
    }
    assert(ex.getMessage != null)
  }
}
