package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Unit pins for the round-12 release/decontamination tier:
  * [[Profile.noisedRelease]]'s suppression + bounded deterministic noise
  * and [[Decontamination.semanticContaminated]]'s bucket recall trade,
  * threshold, and best-match tiebreak.
  */
class ReleaseDecontamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def groupsDf = {
    // group "a": 7 rows, "b": 6 rows, "c": 2 rows (suppressed at k=5)
    val rows = Seq.fill(7)("a") ++ Seq.fill(6)("b") ++ Seq.fill(2)("c")
    rows.toDF("g")
  }

  test("noisedRelease: small classes NULL, survivors within n±32, never negative") {
    val out = Profile.noisedRelease(groupsDf, col("g"), k = 5, seed = "s1")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))).toMap
    assert(out.size === 3)
    assert(out("c") === ((None, 1)))           // n=2 < 5 → withheld
    for (g <- Seq("a", "b")) {
      val (Some(rel), sup) = out(g)
      assert(sup === 0)
      val n = if (g == "a") 7L else 6L
      // Binomial(64,1/2) − 32 ∈ [−32, 32], clamped at 0
      assert(rel >= 0L && rel <= n + 32)
    }
  }

  test("noisedRelease: replayable per seed, a fresh seed redraws the noise") {
    val a1 = Profile.noisedRelease(groupsDf, col("g"), 1, "s1").collect().toSet
    val a2 = Profile.noisedRelease(groupsDf, col("g"), 1, "s1").collect().toSet
    assert(a1 === a2)                          // same seed → byte-identical
    val b = Profile.noisedRelease(groupsDf, col("g"), 1, "s2")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = a1.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.keySet === b.keySet)
    assert(a !== b)                            // md5(key:seed) moved the draw
  }

  test("semanticContaminated: threshold, best-match tiebreak, bucket recall trade") {
    // Sign buckets over the first 4 dims (bit j set iff dim j > 0):
    // eval 1 and 2 are identical in bucket 0b0011 (tiebreak fixture);
    // eval 3 is train 12's near-twin flipped in dim 0 only — cosine
    // ≈0.9999 but a DIFFERENT bucket, so the banded operator must MISS
    // it (the documented exact-bucket recall trade).
    val evalSet = Seq(
      (1L, Array(1f, 1f, 0f, 0f)),
      (2L, Array(1f, 1f, 0f, 0f)),
      (3L, Array(-0.01f, 1f, 1f, 0f))).toDF("vec_id", "embedding")
    val train = Seq(
      (10L, Array(1f, 1f, -0.1f, 0f)),   // bucket 0b0011: tie on cosine
      (11L, Array(0.1f, 0.1f, -5f, 0f)), // same bucket, low cosine: filtered
      (12L, Array(0.01f, 1f, 1f, 0f))).toDF("vec_id", "embedding")
    val out = Decontamination.semanticContaminated(train, evalSet,
        bits = 4, tau = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet === Set(10L))            // 11 under tau; 12 cross-bucket
    assert(out(10L)._1 === 1L)                 // tie → smaller eval_id
    assert(out(10L)._2 > 0.99)
  }

  test("semanticContaminated: byte gate steers join strategy, never answers") {
    import graft.{Tables, TestSpark => TS}
    val emb = Tables.load(spark, TS.sfDir, "embeddings")
    val train = emb.filter(col("vec_id") >= 25)
    val ev = emb.filter(col("vec_id") < 25)
    val gated = Decontamination.semanticContaminated(train, ev, 6, 0.15)
    val forced = Decontamination.semanticContaminated(train, ev, 6, 0.15,
      broadcastBudgetBytes = 1L)
    val pg = gated.queryExecution.executedPlan.toString
    val pf = forced.queryExecution.executedPlan.toString
    assert(pg.contains("BroadcastHashJoin"))   // under budget: train never shuffles
    assert(!pf.contains("BroadcastHashJoin") && pf.contains("ShuffledHashJoin"))
    assert(gated.collect().toSet === forced.collect().toSet)
  }
}
