package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Winnowing (Schleimer et al. 2003): the row-local window-min selection
  * against a direct Scala reference, the paper's local-fingerprinting
  * guarantee, the degenerate short-doc windows, and winnowPairs' df cap. */
class WinnowSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val K = 5
  private val W = 4

  // Reference implementation: same md5-48 gram hash, same window minima.
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def h48(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 12), 16)
  private def refFps(text: String, k: Int = K, w: Int = W): Set[Long] = {
    val toks = text.split(" ")
    if (toks.length < k) Set.empty
    else {
      val gh = (0 to toks.length - k).map(i => h48(toks.slice(i, i + k).mkString(" ")))
      val nw = math.max(gh.length - w + 1, 1)
      (0 until nw).map(j => gh.slice(j, math.min(j + w, gh.length)).min).toSet
    }
  }

  private def sparkFps(docs: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextHashing.winnowFingerprints(col("text"), K, W).as("f"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
  }

  private val vocab = Array("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "mu", "nu")
  private def randDoc(rng: scala.util.Random, n: Int): String =
    Array.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" ")

  test("selection matches the direct reference on randomized docs") {
    val rng = new scala.util.Random(42)
    val docs = (1L to 40L).map(i => i -> randDoc(rng, 3 + rng.nextInt(60)))
    val got = sparkFps(docs)
    docs.foreach { case (id, text) =>
      assert(got(id) === refFps(text), s"doc $id: '$text'")
    }
  }

  test("guarantee: a shared run of >= w+k-1 tokens yields a shared fingerprint") {
    val rng = new scala.util.Random(7)
    (1 to 25).foreach { _ =>
      val run = randDoc(rng, W + K - 1) // exactly the guarantee threshold
      val a = s"${randDoc(rng, 10)} $run ${randDoc(rng, 10)}"
      val b = s"${randDoc(rng, 15)} $run ${randDoc(rng, 5)}"
      val fps = sparkFps(Seq(1L -> a, 2L -> b))
      assert((fps(1L) intersect fps(2L)).nonEmpty,
        s"no shared fingerprint for shared run '$run'")
    }
  }

  test("density bound and containment: fps are gram minima, at most n-w+1 of them") {
    val rng = new scala.util.Random(11)
    (1 to 10).foreach { _ =>
      val text = randDoc(rng, 20 + rng.nextInt(40))
      val toks = text.split(" ")
      val grams = (0 to toks.length - K).map(i => h48(toks.slice(i, i + K).mkString(" ")))
      val fps = sparkFps(Seq(1L -> text))(1L)
      assert(fps.subsetOf(grams.toSet))
      assert(fps.size <= math.max(grams.size - W + 1, 1))
    }
  }

  test("short docs: < k tokens -> empty; k <= tokens < k+w-1 -> the single global min") {
    val fps = sparkFps(Seq(
      1L -> "alpha beta gamma delta",           // 4 toks < k=5 -> no grams
      2L -> "alpha beta gamma delta eps",       // 1 gram -> 1 window
      3L -> "alpha beta gamma delta eps zeta")) // 2 grams < w -> 1 whole-doc window
    assert(fps(1L).isEmpty)
    assert(fps(2L) === refFps("alpha beta gamma delta eps"))
    assert(fps(3L).size === 1)
    val toks3 = "alpha beta gamma delta eps zeta".split(" ")
    val g3 = (0 to 1).map(i => h48(toks3.slice(i, i + K).mkString(" ")))
    assert(fps(3L).head === g3.min)
  }

  test("winnowPairs finds a mutated near-copy and respects minShared") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val base = randDoc(rng, 60)
    val mutated = { val t = base.split(" "); t(30) = "CHANGED"; t.mkString(" ") }
    val other = randDoc(rng, 60)
    val pairs = Dedup.winnowPairs(
        Seq(1L -> base, 2L -> mutated, 3L -> other).toDF("doc_id", "text"),
        "doc_id", "text", k = K, w = W, minShared = 3, dfCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 3L),
      s"near-copy pair missing from ${pairs.toSeq}")
  }

  test("df cap: a fingerprint shared by more than dfCap docs pairs nobody") {
    import spark.implicits._
    val text = "alpha beta gamma delta eps zeta eta theta iota kappa"
    val docs = (1L to 5L).map(i => i -> text).toDF("doc_id", "text")
    val capped = Dedup.winnowPairs(docs, "doc_id", "text",
      k = K, w = W, minShared = 1, dfCap = 4).count()
    assert(capped === 0L, "df 5 > cap 4 must suppress every pair")
    val uncapped = Dedup.winnowPairs(docs, "doc_id", "text",
      k = K, w = W, minShared = 1, dfCap = 10).count()
    assert(uncapped === 10L, "5 identical docs = C(5,2) pairs under the cap")
  }
}
