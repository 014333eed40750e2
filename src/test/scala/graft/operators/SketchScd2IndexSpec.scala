package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Round-8 part-2 operators: KMV sketches, SCD2 history, inverted phrase
  * index, quantized LM surprisal, PMI lift, priority sampling. Value
  * parity vs DuckDB is pinned by the q101-q106 oracles; these specs pin
  * the operator PROPERTIES the oracles can't see: sketch mergeability,
  * interval partition/snapshot consistency, estimator bounds, and the
  * top-k/τ cut reproduced by hand.
  */
class SketchScd2IndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // --- KMV -----------------------------------------------------------

  test("kmvSketch: size ≤ k, ascending, kth_min is the k-th element") {
    val df = (0 until 500).map(i => ("g", s"tok$i")).toDF("g", "t")
    val sk = Sketches.kmvSketch(df, col("g"), col("t"), k = 64).collect()
    assert(sk.length == 1)
    val hs = sk(0).getSeq[Long](sk(0).fieldIndex("hs"))
    assert(hs.length == 64)
    assert(hs == hs.sorted)
    assert(sk(0).getLong(sk(0).fieldIndex("kth_min")) == hs.last)
  }

  test("kmvSketch on a small group is the full distinct-hash set") {
    val df = (0 until 20).map(i => ("g", s"tok${i % 10}")).toDF("g", "t")
    val sk = Sketches.kmvSketch(df, col("g"), col("t"), k = 64).collect()(0)
    assert(sk.getSeq[Long](sk.fieldIndex("hs")).length == 10)
    assert(sk.isNullAt(sk.fieldIndex("kth_min"))) // never filled k slots
  }

  test("kmv sketches are mergeable: bottom-k of a union = bottom-k over the two sketches") {
    val a = (0 until 300).map(i => ("a", s"t$i"))
    val b = (150 until 450).map(i => ("b", s"t$i"))
    val both = (a ++ b).toDF("g", "t")
    val sk = Sketches.kmvSketch(both, col("g"), col("t"), k = 32)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](r.fieldIndex("hs"))).toMap
    // ground truth: bottom-32 of the distinct union of raw hashes
    val rawUnion = both.select(TextAnalysis.md5Hash48(col("t")).as("h"))
      .distinct().orderBy(col("h")).limit(32).collect().map(_.getLong(0)).toSeq
    val merged = (sk("a") ++ sk("b")).distinct.sorted.take(32)
    assert(merged == rawUnion)
  }

  test("kmvSourceSimilarity: identical sources estimate 1.0; exact column agrees on small data") {
    val docs = (0 until 40).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      (i.toLong, src, s"alpha bravo charlie delta echo tok${i / 2} foxtrot golf hotel india")
    }.toDF("doc_id", "source", "text")
    // a and b see the same bigram population except the tok${i/2} windows
    val out = Sketches.kmvSourceSimilarity(docs, "source", "text", n = 2, k = 256)
      .collect()(0)
    val est = out.getDouble(out.fieldIndex("jaccard_est"))
    val exact = out.getDouble(out.fieldIndex("jaccard_exact"))
    // k=256 over < 256 distinct grams → sketch is exhaustive → est == exact
    assert(math.abs(est - exact) < 1e-9, s"est=$est exact=$exact")
  }

  test("histogramQuantiles: estimates land within one bin width of the exact rank values") {
    // uniform 1..1000: exact ceil-rank p50 = 500, p90 = 900
    val df = (1L to 1000L).map(i => ("g", i)).toDF("g", "v")
    val out = Sketches.histogramQuantiles(df, col("g"), col("v"), 32).collect()(0)
    val width = out.getLong(out.fieldIndex("bin_width"))
    val p50 = out.getLong(out.fieldIndex("p50_est"))
    val p90 = out.getLong(out.fieldIndex("p90_est"))
    assert(p50 <= 500L && 500L < p50 + width, s"p50=$p50 width=$width")
    assert(p90 <= 900L && 900L < p90 + width, s"p90=$p90 width=$width")
  }

  // --- SCD2 ----------------------------------------------------------

  private def scdFixture = {
    val base = Seq((1L, "one v0"), (2L, "two v0"), (3L, "three v0"))
      .toDF("k", "payload")
    val changes = Seq(
      (1L, "one v1", "upsert", 5L),
      (1L, "one v2", "upsert", 9L),
      (2L, null.asInstanceOf[String], "delete", 4L),
      (4L, "four v1", "upsert", 7L))
      .toDF("k", "payload", "op", "seq")
    (base, changes)
  }

  test("scd2History: intervals chain per key, one current version per live key") {
    val (base, changes) = scdFixture
    val hist = Merge.scd2History(base, changes, "k", "seq", "op")
      .orderBy(col("k"), col("valid_from")).collect()
    val byKey = hist.groupBy(_.getLong(0))
    // key 1: v0 [0,5), v1 [5,9), v2 [9,∞)
    val k1 = byKey(1L).map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(k1.toSeq == Seq((0L, 5L), (5L, 9L), (9L, -1L)))
    // chained: each valid_to = next valid_from
    byKey.values.foreach { vs =>
      vs.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) == b.getLong(2))
        case _ =>
      }
    }
    // key 2 deleted: one closed version, no current
    val k2 = byKey(2L)
    assert(k2.length == 1 && !k2(0).isNullAt(3) && !k2(0).getBoolean(4))
    // key 4 inserted mid-stream: opens at 7, current
    val k4 = byKey(4L)
    assert(k4.length == 1 && k4(0).getLong(2) == 7L && k4(0).getBoolean(4))
    // exactly one current per live key
    assert(hist.count(_.getBoolean(4)) == 3) // keys 1, 3, 4
  }

  test("scd2History current versions == applyChanges snapshot") {
    val (base, changes) = scdFixture
    val current = Merge.scd2History(base, changes, "k", "seq", "op")
      .filter(col("is_current")).select(col("k"), col("payload"))
    val snapshot = Merge.applyChanges(base, changes, "k", "seq", "op")
    assert(current.exceptAll(snapshot).isEmpty && snapshot.exceptAll(current).isEmpty)
  }

  // --- inverted index ------------------------------------------------

  test("invertedIndex: df == postings length, ascending ids, band respected") {
    val docs = (0L until 30L)
      .map(i => (i, s"common${if (i < 4) " rare" else ""} tail$i"))
      .toDF("id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "id", "text", minDf = 2, maxDf = 10)
      .collect()
    // "common" df=30 > maxDf → dropped; each "tail$i" df=1 < minDf → dropped
    assert(idx.length == 1)
    val r = idx(0)
    assert(r.getString(0) == "rare" && r.getLong(1) == 4L)
    assert(r.getString(2) == "0,1,2,3")
  }

  // --- surprisal -----------------------------------------------------

  test("floorLog2 matches java.lang.Long.numberOfLeadingZeros on a sweep") {
    val xs = Seq(1L, 2L, 3L, 7L, 8L, 1023L, 1024L, (1L << 40) - 1, 1L << 40)
    val got = xs.toDF("x").select(TextAnalysis.floorLog2(col("x")).as("b"))
      .collect().map(_.getInt(0))
    val want = xs.map(x => 63 - java.lang.Long.numberOfLeadingZeros(x))
    assert(got.toSeq == want)
  }

  test("unigramSurprisal: rare-token docs score more bits than common-token docs") {
    val docs = ((0L until 50L).map(i => (i, "the the the the"))
      ++ Seq((99L, "zyzzyva qwertyuiop"))).toDF("id", "text")
    val out = TextAnalysis.unigramSurprisal(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(99L) > out(0L))
    // all docs but 99 identical → identical scores
    assert(out(0L) == out(49L))
  }

  // --- PMI lift ------------------------------------------------------

  test("pmiCollocations: an exclusive adjacent pair lifts above an independent one") {
    val docs = ((0 until 20).map(i => s"salt pepper filler$i")
      ++ (0 until 20).flatMap(i => Seq(s"salt filler${i}a", s"pepper filler${i}b")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    // "salt pepper" co-occurs every time salt starts a doc with pepper next —
    // lift must clear 1; no other pair reaches minCount=5
    assert(out.contains(("salt", "pepper")))
    assert(out(("salt", "pepper")) > 1.0)
  }

  // --- priority sampling ---------------------------------------------

  test("prioritySample reproduces the hand-computed top-k cut and τ") {
    val docs = (0L until 200L).map(i => (i, s"doc body $i", 10L + i % 37))
      .toDF("id", "text", "w")
    val k = 20
    val got = Sampling.prioritySample(docs, col("text"), col("w"), k)
      .select(col("id"), col("est_weight")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // recompute priorities by hand
    val pri = docs.select(col("id"), col("w"),
        (TextAnalysis.md5Hash48(col("text")) + lit(1L)).cast("double").as("hd"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getLong(1).toDouble / (r.getDouble(2) / (1L << 48).toDouble)))
      .sortBy(-_._3)
    val expectIds = pri.take(k).map(_._1).toSet
    val tau = pri(k)._3
    assert(got.keySet == expectIds)
    got.foreach { case (id, est) =>
      val w = pri.find(_._1 == id).get._2.toDouble
      assert(est == math.max(w, tau), s"id=$id est=$est w=$w tau=$tau")
      assert(est >= w)
    }
  }

  test("prioritySample with population ≤ k keeps everything at its true weight") {
    val docs = (0L until 10L).map(i => (i, s"t$i", i + 1L)).toDF("id", "text", "w")
    val got = Sampling.prioritySample(docs, col("text"), col("w"), 25)
      .select(col("id"), col("est_weight")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 10)
    got.foreach { case (id, est) => assert(est == (id + 1L).toDouble) }
  }
}
