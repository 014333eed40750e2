package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** FIM transform (Bavarian et al. 2022): md5s against a direct Scala
  * reference, the reconstruction property (the three segments reassemble
  * the original text), mode-rate sanity, and degenerate cuts. */
class FimSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def h48(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 12), 16)

  /** Direct reference of the whole transform. */
  private def refFim(text: String, ratePct: Int = 50)
    : (String, Long, Long, String) = {
    val n = text.length
    val a = h48(text + ":c1") % (n + 1)
    val b = h48(text + ":c2") % (n + 1)
    val (lo, hi) = (math.min(a, b), math.max(a, b))
    val hf = h48(text + ":fim")
    val (pre, mid, suf) = (text.substring(0, lo.toInt),
      text.substring(lo.toInt, hi.toInt), text.substring(hi.toInt))
    val (mode, out) =
      if (hf % 100 >= ratePct) ("ar", text)
      else if ((hf / 100) % 2 == 0) ("psm", s"<PRE>$pre<SUF>$suf<MID>$mid")
      else ("spm", s"<SUF>$suf<PRE>$pre<MID>$mid")
    (mode, lo, hi, md5hex(out))
  }

  private val vocab = Array("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")
  private def randDoc(rng: scala.util.Random, n: Int): String =
    Array.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" ")

  private def run(docs: Seq[(Long, String)])
    : Map[Long, (String, Long, Long, String)] = {
    import spark.implicits._
    Packing.fimTransform(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
  }

  test("transform matches the direct reference on randomized docs") {
    val rng = new scala.util.Random(31)
    val docs = (1L to 120L).map(i => i -> randDoc(rng, 1 + rng.nextInt(50))) ++
      Seq(500L -> "", 501L -> "x", 502L -> "ab")
    val got = run(docs)
    docs.foreach { case (id, text) =>
      assert(got(id) === refFim(text), s"doc $id: '$text'")
    }
  }

  test("reconstruction: segments reassemble the original for every mode") {
    val rng = new scala.util.Random(43)
    (1 to 60).foreach { i =>
      val text = randDoc(rng, 5 + rng.nextInt(40))
      val (mode, lo, hi, _) = refFim(text)
      val (pre, mid, suf) = (text.substring(0, lo.toInt),
        text.substring(lo.toInt, hi.toInt), text.substring(hi.toInt))
      assert(pre + mid + suf === text, s"case $i mode=$mode")
    }
  }

  test("mode rates: ~50% ar, fim split between psm and spm") {
    val rng = new scala.util.Random(59)
    val docs = (1L to 400L).map(i => i -> randDoc(rng, 3 + rng.nextInt(30)))
    val modes = run(docs).values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(modes("ar") > 140 && modes("ar") < 260, modes.toString)
    assert(modes.getOrElse("psm", 0) > 50 && modes.getOrElse("spm", 0) > 50,
      modes.toString)
  }
}
