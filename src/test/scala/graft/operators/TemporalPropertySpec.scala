package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Property-based equivalence for the temporal joins: on ScalaCheck-
 * generated event/interval sets (fixed seeds — the scalatest bridge
 * isn't in the offline cache), the scale-safe rewrites must reproduce
 * the NAIVE formulation row for row:
 *  - asOfJoin ≡ per-left argmax over a non-equi theta join (computed
 *    Scala-side), inclusive and strict, under heavy timestamp collisions
 *    (small key/time domains force ties constantly);
 *  - rangeJoinBinned ≡ the naive BETWEEN join for every bucket size,
 *    including buckets far smaller and far larger than the window.
 */
class TemporalPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  // (id, key, secondsOffset) with tiny domains → many exact ts collisions
  private def rowsGen(n: Int, ids: Range): Gen[List[(Long, Long, Int)]] =
    Gen.listOfN(n, Gen.zip(Gen.chooseNum(ids.start, ids.end),
        Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0, 40))))
      .map(_.map { case (i, (k, s)) => (i.toLong, k, s) }.distinctBy(_._1))

  private def sample(seed: Long, n: Int, ids: Range) =
    rowsGen(n, ids)(Gen.Parameters.default, Seed(seed)).get

  test("asOfJoin ≡ naive argmax under timestamp collisions, both boundary modes") {
    for (seed <- 1L to 4L; inclusive <- Seq(true, false)) {
      val lRows = sample(seed, 60, 0 to 999)
      val rRows = sample(seed + 100, 60, 1000 to 1999)
      val left = lRows.map { case (i, k, s) => (i, k, new Timestamp(base + s * 1000L)) }
        .toDF("lid", "k", "lt")
      val right = rRows.map { case (i, k, s) => (i, k, new Timestamp(base + s * 1000L)) }
        .toDF("rid", "k", "rt")

      val got = Temporal.asOfJoin(left, right,
          leftKey = col("k"), rightKey = col("k"),
          leftTime = col("lt"), rightTime = col("rt"),
          payload = Seq("m_rid" -> col("rid")),
          tieBreak = col("rid"), inclusive = inclusive)
        .select("lid", "m_rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

      val expected = lRows.map { case (lid, lk, ls) =>
        val cands = rRows.filter { case (_, rk, rs) =>
          rk == lk && (if (inclusive) rs <= ls else rs < ls) }
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy { case (rid, _, rs) => (rs, rid) }._1))
      }.toMap

      assert(got === expected, s"seed=$seed inclusive=$inclusive")
      assert(got.size === lRows.size) // left-outer: no drops, no dupes
    }
  }

  test("rangeJoinBinned ≡ naive BETWEEN join for bucket ≪ window, = window, ≫ window") {
    for (seed <- 1L to 3L; bucketSeconds <- Seq(3L, 10L, 600L)) {
      val pRows = sample(seed, 70, 0 to 999)
      val iRows = sample(seed + 200, 25, 1000 to 1999)
      val probes = pRows.map { case (i, _, s) => (i, new Timestamp(base + s * 1000L)) }
        .toDF("p_id", "pt")
      // half-open [lo, lo+10s) windows on whole seconds
      val intervals = iRows.map { case (i, _, s) =>
        (i, new Timestamp(base + s * 1000L), new Timestamp(base + (s + 10) * 1000L)) }
        .toDF("iv_id", "lo", "hi")

      val got = Temporal.rangeJoinBinned(probes, col("pt"), intervals,
          col("lo"), col("hi"), bucketSeconds)
        .select("p_id", "iv_id").as[(Long, Long)].collect().toSet

      val expected = (for {
        (pid, _, ps) <- pRows
        (ivid, _, is) <- iRows
        if ps >= is && ps < is + 10
      } yield (pid, ivid)).toSet

      assert(got === expected, s"seed=$seed bucket=$bucketSeconds")
    }
  }
}
