package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(2f, 0f, 0f, 0f)),      // parallel to 0 (same sign pattern)
    (2L, Array(0f, 1f, 0f, 0f)),      // orthogonal to 0
    (3L, Array(-1f, 0f, 0f, 0f))      // opposite of 0
  ).toDF("vec_id", "embedding")

  test("native graft_cosine matches the composable dot/norm form bit-for-bit") {
    val both = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        SimilaritySearch.cosine(col("a.embedding"), col("b.embedding")).as("native"),
        (SimilaritySearch.dot(col("a.embedding"), col("b.embedding")) /
          (SimilaritySearch.l2norm(col("a.embedding")) *
            SimilaritySearch.l2norm(col("b.embedding")))).as("composed"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
    }
  }

  test("dot and l2norm compute expected values") {
    val r = vecs.filter(col("vec_id") === 0)
      .select(SimilaritySearch.dot(col("embedding"), col("embedding")).as("d"),
        SimilaritySearch.l2norm(col("embedding")).as("n")).collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0)
  }

  test("bruteForceTopK ranks nearly-parallel > orthogonal > opposite") {
    val top = SimilaritySearch.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, 3)
      .orderBy(col("rank")).collect()
    assert(top.map(_.getAs[Long]("cand_id")).toSeq == Seq(1L, 2L, 3L))
    assert(top(0).getAs[Double]("cosine") > 0.99)
    assert(math.abs(top(1).getAs[Double]("cosine")) < 1e-6)
    assert(top(2).getAs[Double]("cosine") == -1.0)
  }

  test("cosineDupPairsExact finds only the near-parallel pair at 0.95") {
    val pairs = SimilaritySearch.cosineDupPairsExact(vecs, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("cosineDupPairs (sign-LSH bucketed) agrees with exact on same-sign dups") {
    // Vectors 0 and 1 share all sign bits, so the bucketed path must keep
    // them; 2 and 3 differ from everything in >1 bit or fail the threshold.
    val pairs = SimilaritySearch.cosineDupPairs(vecs, 0.95, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("signBucket: same-sign vectors share a bucket, opposite don't") {
    val b = vecs.select(col("vec_id"), SimilaritySearch.signBucket(col("embedding"), 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(1L))
    assert(b(0L) != b(3L))
  }

  test("ivfTopK with all lists probed equals brute force; fewer probes are a subset") {
    val queries = vecs.filter(col("vec_id") < 2)
    val all = SimilaritySearch.ivfTopK(queries, vecs, 3, bits = 2, nprobe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("cand_id"))).toSet
    val brute = SimilaritySearch.bruteForceTopK(queries, vecs, 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("cand_id"))).toSet
    assert(all == brute) // probing every inverted list = exact search
    val one = SimilaritySearch.ivfTopK(queries, vecs, 3, bits = 2, nprobe = 1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val brutePairs = brute.map(t => (t._1, t._3))
    assert(one.subsetOf(brutePairs) && one.nonEmpty)
  }

  test("lshTopK only returns same-bucket candidates") {
    val top = SimilaritySearch.lshTopK(vecs.filter(col("vec_id") === 0), vecs, 5, 4)
      .collect()
    assert(top.map(_.getAs[Long]("cand_id")).toSet == Set(1L)) // only 1 shares bucket
  }

  test("quantize: symmetric global-scale codes, half-up rounding, signs preserved") {
    val df = Seq(
      (0L, Array(0f, 5f, 1f)),
      (1L, Array(10f, 5f, 2f)),
      (2L, Array(-5f, 5f, 3f))
    ).toDF("vec_id", "embedding")
    // gmax = 10 → code = floor(x/10*127 + 0.5)
    val coded = SimilaritySearch.quantize(df)
      .select("vec_id", "qv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(coded(0L) == Seq(0, 64, 13))      // floor(63.5+.5)=64, floor(12.7+.5)=13
    assert(coded(1L) == Seq(127, 64, 25))    // the max magnitude hits ±127 exactly
    assert(coded(2L) == Seq(-63, 64, 38))    // floor(-63.5+.5)=-63: sign survives
  }

  test("quantizedTopK preserves the coarse similarity order of brute force") {
    val q = vecs.filter(col("vec_id") === 0)
    val top = SimilaritySearch.quantizedTopK(q, vecs, 3)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("cand_id")))
      .sortBy(_._1).map(_._2).toSeq
    // parallel beats orthogonal beats opposite, exactly like exact cosine
    assert(top == Seq(1L, 2L, 3L))
  }

  test("capPerStratum keeps at most N per stratum and is crawl-stable") {
    val docs = (0L until 30L).map(i => (i, s"s${i % 2}", s"content $i"))
      .toDF("doc_id", "src", "text")
    val kept = Sampling.capPerStratum(docs, col("src"), col("text"), 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kept.count(_._2 == "s0") == 5 && kept.count(_._2 == "s1") == 5)
    // appending MORE rows to a stratum keeps the same survivors for rows
    // already present (content-hash rank is insertion-order independent)
    val more = (0L until 40L).map(i => (i, s"s${i % 2}", s"content $i"))
      .toDF("doc_id", "src", "text")
    val kept2 = Sampling.capPerStratum(more, col("src"), col("text"), 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // survivors under the bigger corpus are drawn from the full hash order,
    // but any doc kept in BOTH runs proves rank stability; at minimum the
    // cap holds and the selection is deterministic
    assert(kept2.count(_._2 == "s0") == 5 && kept2.count(_._2 == "s1") == 5)
    val kept2b = Sampling.capPerStratum(more, col("src"), col("text"), 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kept2 == kept2b)
  }

  test("mmrSelect: diversity beats a redundant second-best; k caps at pool size") {
    // query along dim 0. A (id 10) and A' (id 11) are near-identical and
    // most relevant; B (id 12) is less relevant but diverse. Pure top-k
    // by relevance picks A, A'; at λ=0.3 (diversity-weighted) A' pays
    // its ≈1.0 redundancy to A (score ≈ −0.40) and loses to B (≈ −0.24),
    // so MMR must pick A, then B, then A'.
    val q = Seq(1f, 0f, 0f, 0f)
    val cands = Seq(
      (10L, Array(1f, 0.1f, 0f, 0f)),
      (11L, Array(1f, 0.11f, 0f, 0f)),
      (12L, Array(0.5f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        graft.Tables.r6(SimilaritySearch.cosine(col("embedding"),
          typedLit(q))).as("rel"))
    val out = SimilaritySearch.mmrSelect(cands, 10, lambda = 0.3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._2).toSeq === Seq(10L, 12L, 11L))  // not 10, 11, ...
    assert(out.length === 3)                   // pool exhausted before k
    assert(out(0)._3 > out(1)._3 && out(1)._3 > out(2)._3)
    // rank-1 score is the raw relevance of the most relevant candidate
    val topRel = cands.agg(max(col("rel"))).collect()(0).getDouble(0)
    assert(out(0)._3 === topRel)
  }

  test("meanPoolVectors: exact per-dim means, relational output") {
    val df = Seq(
      (1L, "g", Array(1f, 2f)),
      (2L, "g", Array(3f, 4f)),
      (3L, "h", Array(5f, -6f))).toDF("id", "grp", "embedding")
    val out = SimilaritySearch.meanPoolVectors(df, col("grp"), "embedding")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out === Map(("g", 0) -> 2.0, ("g", 1) -> 3.0,
      ("h", 0) -> 5.0, ("h", 1) -> -6.0))
  }

  test("retrievalRecallReport: micro-rational MRR, misses count as zero") {
    val exact = Seq((1L, 1, 100L), (2L, 1, 200L), (3L, 1, 300L))
      .toDF("query_id", "rank", "cand_id")
    val approx = Seq(
      (1L, 1, 9L), (1L, 2, 100L),   // true NN at rank 2 → rr 0.5
      (2L, 1, 8L), (2L, 2, 7L),     // miss
      (3L, 1, 300L)                 // hit at rank 1
    ).toDF("query_id", "rank", "cand_id")
    val r = SimilaritySearch.retrievalRecallReport(approx, exact, 3).collect()(0)
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === 0.666667)          // recall 2/3, r6
    assert(r.getDouble(2) === 0.5)               // (500000 + 1000000) / 3e6
  }

  test("topPrincipalComponent: finds a planted dominant direction, max-normed") {
    // points along (3, 1): cov = [[18, 6], [6, 2]], PC1 ∝ (3, 1) →
    // max-normed exactly (1.0, 1/3)
    val pts = Seq(-2f, -1f, 0f, 1f, 2f).zipWithIndex
      .map { case (t, i) => (i.toLong, Array(3f * t, t)) }
      .toDF("vec_id", "embedding")
    val w = SimilaritySearch.topPrincipalComponent(pts, "embedding")
      .orderBy(col("dim")).collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(w.length === 2)
    assert(w(0)._2 === 1.0)                     // max-|weight| element = 1
    assert(math.abs(w(1)._2 - 1.0 / 3) < 2e-6)  // r6 fixed-point precision
    // deterministic replay: the whole walk is exact fixed-point
    val w2 = SimilaritySearch.topPrincipalComponent(pts, "embedding")
      .orderBy(col("dim")).collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(w.sameElements(w2))
    // projection onto (1, 1/3): score(t) = 3t + t/3 = (10/3)t — linear in
    // t, so consecutive gaps are equal and the t=0 point scores 0
    val s = SimilaritySearch.pcProjection(pts, "vec_id", "embedding")
      .orderBy(col("vec_id")).collect().map(_.getDouble(1))
    assert(s(2) === 0.0)
    val gaps = s.sliding(2).map(p => BigDecimal(p(1) - p(0)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP)).toSeq
    assert(gaps.distinct.size === 1 && math.abs(gaps.head.toDouble - 10.0 / 3) < 1e-3)
  }
}
