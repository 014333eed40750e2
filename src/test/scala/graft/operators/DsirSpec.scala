package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DSIR rational importance weights (Sampling.dsirWeights): the ratio-of-
  * sums surrogate against a direct Scala reference, the target-likeness
  * ordering it exists to produce, add-one smoothing on unseen buckets,
  * and the no-token edge case. Cross-engine value parity is the q197
  * DuckDB gate; these pin the operator's semantics. */
class DsirSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val B = 64

  // Direct reference: same md5-48 bucket hash, same add-one ratio of sums.
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def bucket(tok: String): Long =
    java.lang.Long.parseLong(md5hex(tok).substring(0, 12), 16) % B

  private def refWeights(docs: Seq[(Long, String, Boolean)])
    : Map[Long, (Long, Long)] = {
    val toks = docs.flatMap { case (id, text, tgt) =>
      text.split(" ").filter(_.nonEmpty).map(t => (id, tgt, bucket(t)))
    }
    val craw = toks.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ctgt = toks.groupBy(_._3).view
      .mapValues(_.count(_._2).toLong).toMap
    toks.groupBy(_._1).view.mapValues { ts =>
      (ts.map(t => ctgt(t._3) + 1L).sum, ts.map(t => craw(t._3) + 1L).sum)
    }.toMap
  }

  private def run(docs: Seq[(Long, String, Boolean)]): Map[Long, (Long, Long, Double)] =
    Sampling.dsirWeights(docs.toDF("id", "text", "tgt"), "id", "text",
        col("tgt"), buckets = B)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("weights match the direct reference on randomized corpora") {
    val vocab = Array("the", "of", "model", "data", "theorem", "proof",
      "lemma", "pizza", "recipe", "oven", "cheese", "train")
    val rng = new scala.util.Random(19)
    val docs = (1L to 60L).map { i =>
      val n = 3 + rng.nextInt(25)
      (i, Array.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" "),
        rng.nextBoolean())
    }
    val got = run(docs)
    val want = refWeights(docs)
    assert(got.keySet === want.keySet)
    want.foreach { case (id, (num, den)) =>
      val (gn, gd, gw) = got(id)
      assert((gn, gd) === ((num, den)), s"doc $id")
      assert(gw === num.toDouble / den.toDouble)
    }
  }

  test("target-likeness ordering: a target-vocab doc outweighs an off-target doc") {
    // Target docs speak 'theorem proof lemma'; raw background speaks
    // 'pizza recipe oven'. A new doc in target vocabulary must score
    // strictly higher than one in background vocabulary.
    val target = (1L to 20L).map(i => (i, "theorem proof lemma theorem proof", true))
    val bg = (21L to 40L).map(i => (i, "pizza recipe oven pizza oven", false))
    val probes = Seq((100L, "theorem lemma proof", false),
      (101L, "pizza oven recipe", false))
    val got = run(target ++ bg ++ probes)
    assert(got(100L)._3 > got(101L)._3,
      s"target-like ${got(100L)} must outweigh background ${got(101L)}")
  }

  test("add-one smoothing: tokens in unseen buckets contribute (1, 1)") {
    // One doc, one token: its bucket has craw=1, ctgt=0 (not target), so
    // w_num = 0+1 = 1... the token IS counted in craw. Check exact values.
    val got = run(Seq((1L, "onlytoken", false)))
    assert(got(1L) === ((1L, 2L, 0.5)))
    val got2 = run(Seq((1L, "onlytoken", true)))
    assert(got2(1L) === ((2L, 2L, 1.0)))
  }

  test("docs with no non-empty tokens emit no row") {
    val got = run(Seq((1L, "", false), (2L, "   ", false), (3L, "word", true)))
    assert(got.keySet === Set(3L))
  }

  test("weights are invariant to doc order and partitioning") {
    val docs = (1L to 30L).map(i =>
      (i, s"token$i shared shared token${i % 5}", i % 3 == 0))
    val a = run(docs)
    val b = Sampling.dsirWeights(
        docs.reverse.toDF("id", "text", "tgt").repartition(7),
        "id", "text", col("tgt"), buckets = B)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(a === b)
  }
}
