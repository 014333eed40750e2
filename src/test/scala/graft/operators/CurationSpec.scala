package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Unit pins for the round-9 curation operators: URL canonicalization
  * corner cases, script-mix classification, winsorize exactness on a
  * hand-computed group, kappa identities, covariance on a known matrix,
  * and the power-iteration eigenvector.
  */
class CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toSeq.toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalizeUrl: case, www, default port, fragment, trackers, order") {
    assert(canon("HTTPS://WWW.Ex.COM:443/a/b?utm_source=x&b=2&a=1#frag")
      === Seq("https://ex.com/a/b?a=1&b=2"))
    // http default port, trailing slash collapse, ref tracker
    assert(canon("http://Ex.com:80/a/b///?ref=nav&z=9")
      === Seq("http://ex.com/a/b?z=9"))
    // root path stays "/", empty path becomes "/"
    assert(canon("https://ex.com", "https://ex.com/")
      === Seq("https://ex.com/", "https://ex.com/"))
    // NON-default port survives; https does not strip :80
    assert(canon("https://ex.com:8080/x", "https://ex.com:80/x")
      === Seq("https://ex.com:8080/x", "https://ex.com:80/x"))
    // no query -> no "?"; all-tracker query -> no "?"
    assert(canon("https://ex.com/p?utm_a=1&utm_b=2&gclid=z&fbclid=y")
      === Seq("https://ex.com/p"))
  }

  test("canonicalizeUrl: unparseable URLs pass through defragmented, never merge") {
    // no scheme -> defragment only; distinct relatives stay distinct
    assert(canon("foo.html?x=1#frag", "bar.html?x=1", "mailto:u@ex.com")
      === Seq("foo.html?x=1", "bar.html?x=1", "mailto:u@ex.com"))
    // and urlDupGroups must NOT merge them onto a shared synthetic key
    val df = Seq((1L, "foo.html?x=1"), (2L, "bar.html?x=1")).toDF("doc_id", "url")
    assert(UrlOps.urlDupGroups(df, "doc_id", "url").count() === 0L)
  }

  test("urlDupGroups: variants collapse, keeper is min id, singletons drop") {
    val df = Seq(
      (1L, "https://A.com/x?id=1"),
      (2L, "https://a.com/x/?id=1&utm_k=v"),
      (3L, "HTTPS://a.com:443/x?id=1"),
      (9L, "https://b.com/only")).toDF("doc_id", "url")
    val out = UrlOps.urlDupGroups(df, "doc_id", "url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("https://a.com/x?id=1", 3L, 3L, 1L)))
  }

  test("scriptMix classifies per class, flags mixed, breaks ties in priority order") {
    val rows = Seq(
      "abc 12",          // latin-dominant, digits present, not mixed (one script)
      "一丁丂", // pure CJK
      "ab абвг", // cyrillic 4 > latin 2, mixed
      "ab一丁",  // TIE latin 2 = cjk 2 -> latin wins (priority order)
      "αβ zz 一") // greek2/latin2/cjk1 -> tie latin first
      .toDF("text")
    val out = rows.select(TextAnalysis.scriptMix(col("text")): _*).collect()
    def row(i: Int) = {
      val r = out(i)
      (r.getLong(1), r.getLong(3), r.getLong(4), r.getString(7), r.getInt(8))
    } // (n_latin, n_cjk, n_cyrillic, dominant, mixed)
    assert(row(0) === ((3L, 0L, 0L, "latin", 0)))
    assert(row(1) === ((0L, 3L, 0L, "cjk", 0)))
    assert(row(2) === ((2L, 0L, 4L, "cyrillic", 1)))
    assert(row(3) === ((2L, 2L, 0L, "latin", 1)))
    assert(row(4) === ((2L, 1L, 0L, "latin", 1)))
  }

  test("robotsFilter: host equi-join + prefix residual, survivors only") {
    val df = Seq(
      (1L, "https://a.com/x/1"), (2L, "https://a.com/y/1"),
      (3L, "https://b.com/x/1"), (4L, "https://c.com/q")).toDF("doc_id", "url")
    val rules = Seq(("a.com", "/x"), ("b.com", "/")).toDF("host", "prefix")
    val kept = UrlOps.robotsFilter(df, "doc_id", "url", rules)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept === Array(2L, 4L))
  }

  test("scriptMix counts astral chars as ONE codepoint (DuckDB length parity)") {
    // "a" + U+1F600 (surrogate pair) + "1": codepoints = 3, UTF-16 len = 4
    val out = Seq("a😀1").toDF("text")
      .select(TextAnalysis.scriptMix(col("text")): _*).collect()(0)
    assert(out.getLong(0) === 3L)   // n_chars_nospace: codepoints, not units
    assert(out.getLong(1) === 1L)   // n_latin
    assert(out.getLong(2) === 1L)   // n_digit
    assert(out.getLong(6) === 1L)   // n_other: the astral char counts once
  }

  test("trendSlope survives epoch-scale x whose x*x LONG product would wrap") {
    // x ~ 4e9: x*x = 1.6e19 > 2^63 — a LONG multiply wraps negative with
    // ANSI off; the decimal-first multiply keeps the slope exact (=1.0)
    val df = Seq((4000000000L, 0L), (4000000001L, 1L)).toDF("x", "y")
      .withColumn("g", lit("s"))
    val r = Temporal.trendSlope(df, col("g"), col("x"), col("y")).collect()(0)
    assert(r.getAs[Double]("slope") === 1.0)
  }

  test("labelCentroidCosine: orthogonal and opposite centroids") {
    val df = Seq(
      (0, Array(1f, 0f)), (0, Array(3f, 0f)),   // centroid along +x
      (1, Array(0f, 2f)),                        // +y -> cos 0 vs label 0
      (2, Array(-5f, 0f))                        // -x -> cos -1 vs label 0
    ).toDF("label", "embedding")
    val m = SimilaritySearch.labelCentroidCosine(df, "label", "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(m((0, 1)) === 0.0)
    assert(m((0, 2)) === -1.0)
    assert(m((1, 2)) === 0.0)
  }

  test("winsorizedStats matches a hand-computed p10/p90 clamp") {
    // one group, values 1..10: pos10 = 1 + 0.1*9 = 1.9 -> 0.1*1 + 0.9*2 = 1.9
    // pos90 = 9.1 -> 0.9*9 + 0.1*10 = 9.1 ; clamped mean:
    // (1.9 + 2..9 + 9.1)/10 = (11 + 44)/10 = 5.5 (sum 2..9 = 44)
    val df = (1 to 10).map(v => ("g1", v.toLong)).toDF("src", "score")
    val r = Profile.winsorizedStats(df, "src", "score", 0.10, 0.90).collect()(0)
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("n_clip_lo") === 1L)
    assert(r.getAs[Long]("n_clip_hi") === 1L)
    assert(r.getAs[Double]("p_lo") === 1.9)
    assert(r.getAs[Double]("p_hi") === 9.1)
    assert(r.getAs[Double]("mean_raw") === 5.5)
    assert(r.getAs[Double]("mean_wins") === 5.5)
  }

  test("winsorizedStats plan has no Window (no single-task-per-group sort)") {
    // the r9 shape ranked via row_number().over(partitionBy(g)) — exact,
    // but per-group parallelism 1; the range-rank rewrite must leave NO
    // window operator anywhere in the physical plan
    val df = (1 to 100).map(v => (s"g${v % 3}", v.toLong)).toDF("src", "score")
    val plan = Profile.winsorizedStats(df, "src", "score", 0.10, 0.90)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window operator in plan:\n$plan")
  }

  test("winsorizedStats: groups spanning range-partition boundaries rank correctly") {
    // many groups x many values with shuffle.partitions=32 forces group
    // slices across partition boundaries; compare against local compute
    val n = 500
    val df = (1 to n).map(v => (s"g${v % 7}", (v * 37 % 101).toLong))
      .toDF("src", "score")
    val out = Profile.winsorizedStats(df, "src", "score", 0.25, 0.75)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    def localStats(g: String): (Long, Double, Double) = {
      val vs = (1 to n).filter(v => s"g${v % 7}" == g)
        .map(v => (v * 37 % 101).toDouble).sorted
      def q(p: Double) = {
        val pos = 1.0 + p * (vs.size - 1)
        val lo = vs((math.floor(pos) - 1).toInt)
        val hi = vs((math.ceil(pos) - 1).toInt)
        val fr = pos - math.floor(pos)
        math.round(((1.0 - fr) * lo + fr * hi) * 1e6) / 1e6
      }
      (vs.size.toLong, q(0.25), q(0.75))
    }
    for (g <- (0 until 7).map(i => s"g$i")) {
      val (cnt, lo, hi) = localStats(g)
      val r = out(g)
      assert(r.getAs[Long]("n") === cnt, s"n for $g")
      assert(r.getAs[Double]("p_lo") === math.round(lo * 1e4) / 1e4, s"p_lo for $g")
      assert(r.getAs[Double]("p_hi") === math.round(hi * 1e4) / 1e4, s"p_hi for $g")
    }
  }

  test("agreementKappa: perfect agreement 1.0, independence ~0, known value") {
    val perfect = Seq((1, 1), (0, 0), (1, 1), (0, 0)).toDF("a", "b")
    val kp = Profile.agreementKappa(perfect.withColumn("g", lit("x")), "g",
      col("a") === 1, col("b") === 1).collect()(0)
    assert(kp.getAs[Double]("kappa") === 1.0)
    // textbook 2x2: n00=20, n01=5, n10=10, n11=15 -> po=0.7,
    // pe=(25*30 + 25*20)/2500 = 0.5 -> kappa = 0.4
    val rows = Seq.fill(20)((0, 0)) ++ Seq.fill(5)((0, 1)) ++
      Seq.fill(10)((1, 0)) ++ Seq.fill(15)((1, 1))
    val k2 = Profile.agreementKappa(rows.toDF("a", "b").withColumn("g", lit("x")),
      "g", col("a") === 1, col("b") === 1).collect()(0)
    assert(k2.getAs[Long]("n00") === 20L)
    assert(k2.getAs[Double]("kappa") === 0.4)
  }

  test("embeddingCovariance on a known 2-dim set") {
    // vectors (1,2),(3,4),(5,0): mean (3,2); cov(0,0)=8/3, cov(1,1)=8/3,
    // cov(0,1) = ((1)(0)+... ) exact: E[xy]-ExEy = (2+12+0)/3 - 6 = -4/3
    val df = Seq(Array(1f, 2f), Array(3f, 4f), Array(5f, 0f)).toDF("embedding")
    val m = SimilaritySearch.embeddingCovariance(df, "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(m((0, 0)) === 2.666667)
    assert(m((1, 1)) === 2.666667)
    assert(m((0, 1)) === -1.333333)
  }

  test("topPrincipalDirection finds the dominant eigenvector of a known 2x2") {
    // [[2,1],[1,2]] -> top eigenvector (1,1)/sqrt(2), eigenvalue 3
    val v = SimilaritySearch.topPrincipalDirection(
      Array((0, 0, 2.0), (0, 1, 1.0), (1, 1, 2.0)), 2)
    val s = math.sqrt(0.5)
    assert(math.abs(v(0) - s) < 1e-9 && math.abs(v(1) - s) < 1e-9)
    // zero matrix: returns the deterministic start vector unchanged
    val z = SimilaritySearch.topPrincipalDirection(Array((0, 0, 0.0)), 2)
    assert(z(0) !== 0.0)
  }
}
