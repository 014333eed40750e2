package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.r6
import graft.TestSpark

/**
  * The native PQ kernels (graft_pq_argmin / graft_pq_sub_dists) must be
  * BIT-identical to the composable r6(subDist2) forms they replace —
  * including the r6 path itself (BigDecimal.valueOf shortest-repr
  * HALF_UP, the drnd doctrine): one midpoint divergence would flip an
  * argmin tie or a LUT cell and break the q147/q147b oracles silently.
  */
class PqEquivalenceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val w = 8
  private val elem = Gen.oneOf(
    Gen.choose(-1.0, 1.0).map(_.toFloat),
    // near-midpoint magnitudes: squared sums land close to .5e-6 grid
    // lines, where a rounding-path mismatch would show first
    Gen.choose(-0.002, 0.002).map(_.toFloat),
    Gen.const(0.0f))
  private def vecGen = Gen.listOfN(w, elem).map(_.toArray)

  private def rows(seed: Long, n: Int): Seq[Array[Float]] =
    (0 until n).map(i =>
      vecGen(Gen.Parameters.default, Seed(seed * 1000 + i)).get)

  test("argmin and sub-dists match the composable forms bit-for-bit") {
    val k = 16
    val cents = rows(1L, k).map(_.map(_.toDouble))
    val cells = cents.zipWithIndex.map { case (c, i) => (i.toLong, c) }
    val df = rows(2L, 60).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "sv")
      .withColumn("cells", typedLit(cells))
      .withColumn("dense", typedLit(cents))
    val composedMin = aggregate(
      col("cells"),
      struct(lit(-1L).as("cid"), lit(Double.MaxValue).as("d")),
      (acc, c) => {
        val d = r6(SimilaritySearch.subDist2(col("sv"), c.getField("_2")))
        when(d < acc.getField("d"),
          struct(c.getField("_1").as("cid"), d.as("d"))).otherwise(acc)
      }).getField("cid")
    val composedDists = transform(col("dense"), c =>
      r6(SimilaritySearch.subDist2(col("sv"), c)))
    val out = df.select(
        call_function("graft_pq_argmin",
          col("sv"),
          transform(col("cells"), c => struct(c.getField("_1").as("cid"),
            c.getField("_2").as("centroid")))).as("nmin"),
        composedMin.as("cmin"),
        call_function("graft_pq_sub_dists", col("sv"), col("dense")).as("nd"),
        composedDists.as("cd"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      val nd = r.getSeq[Double](2); val cd = r.getSeq[Double](3)
      assert(nd.size === cd.size)
      nd.zip(cd).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a) ===
          java.lang.Double.doubleToRawLongBits(b))
      }
    }
  }

  test("double-element sub-vectors (the IVFADC residual path) match the composable forms") {
    val k = 16
    val cents = rows(5L, k).map(_.map(_.toDouble))
    val cells = cents.zipWithIndex.map { case (c, i) => (i.toLong, c) }
    val df = rows(6L, 40).zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toDouble)) }
      .toDF("id", "sv")
      .withColumn("cells", typedLit(cells))
      .withColumn("dense", typedLit(cents))
    val composedMin = aggregate(
      col("cells"),
      struct(lit(-1L).as("cid"), lit(Double.MaxValue).as("d")),
      (acc, c) => {
        val d = r6(SimilaritySearch.subDist2(col("sv"), c.getField("_2")))
        when(d < acc.getField("d"),
          struct(c.getField("_1").as("cid"), d.as("d"))).otherwise(acc)
      }).getField("cid")
    val composedDists = transform(col("dense"), c =>
      r6(SimilaritySearch.subDist2(col("sv"), c)))
    val out = df.select(
        call_function("graft_pq_argmin",
          col("sv"),
          transform(col("cells"), c => struct(c.getField("_1").as("cid"),
            c.getField("_2").as("centroid")))).as("nmin"),
        composedMin.as("cmin"),
        call_function("graft_pq_sub_dists", col("sv"), col("dense")).as("nd"),
        composedDists.as("cd"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      val nd = r.getSeq[Double](2); val cd = r.getSeq[Double](3)
      assert(nd.size === cd.size)
      nd.zip(cd).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a) ===
          java.lang.Double.doubleToRawLongBits(b))
      }
    }
  }

  test("length-mismatched centroids null-propagate like the composable zip_with — no silent prefix score") {
    // pre-r12 the native kernel truncated to min-length and scored a
    // PREFIX distance on a malformed codebook while the composable form
    // (zip_with pads with null → aggregate null-propagates) returned
    // null — a silent native/composable divergence. Both now agree: null
    // LUT slot, and argmin SKIPS the malformed cell (the composable
    // when(d < acc.d) fold keeps acc on a null comparison).
    val df = Seq((1L, Array(1f, 2f, 3f, 4f))).toDF("id", "sv")
    val shortCent = Array(1.0, 2.0)           // malformed: width 2 vs 4
    val goodCent = Array(0.9, 2.1, 3.0, 4.0)
    val out = df.select(
      call_function("graft_pq_sub_dists", col("sv"),
        array(typedLit(shortCent), typedLit(goodCent))).as("d"),
      r6(SimilaritySearch.subDist2(col("sv"), typedLit(shortCent))).as("cshort"),
      call_function("graft_pq_argmin", col("sv"),
        array(struct(lit(7L).as("cid"), typedLit(shortCent).as("centroid")),
              struct(lit(9L).as("cid"), typedLit(goodCent).as("centroid")))).as("m"))
      .collect()(0)
    val d = out.getSeq[java.lang.Double](0)
    assert(d(0) == null, "malformed-width cell must score null, not a prefix distance")
    assert(d(1) != null)
    assert(out.isNullAt(1), "composable form null-propagates — the parity target")
    assert(out.getLong(2) === 9L, "argmin must skip the malformed cell")
  }

  test("null dense slots stay null; empty cells give cid -1") {
    val df = Seq((1L, Array(1f, 2f))).toDF("id", "sv")
    val out = df.select(
      call_function("graft_pq_sub_dists", col("sv"),
        array(lit(null).cast("array<double>"), typedLit(Array(1.0, 2.0)))).as("d"),
      call_function("graft_pq_argmin", col("sv"),
        typedLit(Seq.empty[(Long, Array[Double])]).cast(
          "array<struct<cid: bigint, centroid: array<double>>>")).as("m"))
      .collect()(0)
    val d = out.getSeq[java.lang.Double](0)
    assert(d(0) == null && d(1) != null)
    assert(out.getLong(1) === -1L)
  }
}
