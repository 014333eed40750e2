package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ICT pair construction (Lee et al. 2019): md5s against a direct Scala
  * reference, query+context partition property when the block is
  * removed, degenerate single-block docs, and keep-rate sanity. */
class IctSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val B = 8

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def h48(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 12), 16)

  private def refIct(text: String, keepPct: Int = 10)
    : (Long, Long, Int, String, String) = {
    val ts = text.split(" ", -1)
    val n = ts.length
    val nb = (n + B - 1) / B
    val j = (h48(text + ":ict") % nb).toInt
    val kept = h48(text + ":keep") % 100 < keepPct
    val q = ts.slice(j * B, math.min(j * B + B, n)).mkString(" ")
    val ctx =
      if (kept) ts.mkString(" ")
      else (ts.take(j * B) ++ ts.drop(j * B + B)).mkString(" ")
    (nb.toLong, j.toLong, if (kept) 1 else 0, md5hex(q), md5hex(ctx))
  }

  private val vocab = Array("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")
  private def randDoc(rng: scala.util.Random, n: Int): String =
    Array.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" ")

  private def run(docs: Seq[(Long, String)])
    : Map[Long, (Long, Long, Int, String, String)] = {
    import spark.implicits._
    Packing.ictPairs(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3),
          r.getString(4), r.getString(5))).toMap
  }

  test("pairs match the direct reference, incl. last-block truncation") {
    val rng = new scala.util.Random(67)
    val docs = (1L to 150L).map(i => i -> randDoc(rng, 1 + rng.nextInt(60))) ++
      Seq(500L -> "solo", 501L -> randDoc(rng, 8), 502L -> randDoc(rng, 9))
    val got = run(docs)
    docs.foreach { case (id, text) =>
      assert(got(id) === refIct(text), s"doc $id: '$text'")
    }
  }

  test("single-block doc: query is the whole doc, removed context is empty") {
    val rng = new scala.util.Random(71)
    // find a short doc whose keep-coin says REMOVE
    val doc = Iterator.continually(randDoc(rng, 5))
      .find(t => h48(t + ":keep") % 100 >= 10).get
    val (nb, j, kept, qMd5, ctxMd5) = run(Seq(1L -> doc))(1L)
    assert(nb === 1L && j === 0L && kept === 0)
    assert(qMd5 === md5hex(doc))
    assert(ctxMd5 === md5hex(""))
  }

  test("keep rate is ~10% over many docs") {
    val rng = new scala.util.Random(83)
    val docs = (1L to 500L).map(i => i -> randDoc(rng, 10 + rng.nextInt(30)))
    val keptN = run(docs).values.count(_._3 == 1)
    assert(keptN > 20 && keptN < 110, s"kept=$keptN of 500")
  }
}
