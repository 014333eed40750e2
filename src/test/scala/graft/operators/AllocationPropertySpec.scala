package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Property pins for the round-12 allocation/release tier on RANDOM
  * stratum distributions (seeded ScalaCheck — deterministic across
  * runs): the invariants the closed forms must satisfy on every input,
  * not just the hand fixtures.
  */
class AllocationPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // up to 8 strata with 1..40 rows each, budgets spanning under/over
  private val caseGen: Gen[(List[Int], Long)] = for {
    sizes <- Gen.nonEmptyListOf(Gen.chooseNum(1, 40)).map(_.take(8))
    k <- Gen.chooseNum(0L, 200L)
  } yield (sizes, k)

  private def cases: Seq[(List[Int], Long)] =
    (1L to 12L).flatMap(s => caseGen(Gen.Parameters.default, Seed(s)))

  private def df(sizes: List[Int]) =
    sizes.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)(s"s$i")
    }.map((_, 1L)).toDF("src", "tok")

  test("apportionSlots: Σ slots = k always (seats, not rows); bounded by counts when k ≤ N") {
    cases.foreach { case (sizes, k) =>
      val n = sizes.sum
      val out = Sampling.apportionSlots(df(sizes), col("src"), k)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // pure Hamilton: the budget is spent exactly, even past N (slots
      // are capacities; materializeApportioned caps them at the rows)
      assert(out.values.map(_._2).sum === k, s"sizes=$sizes k=$k out=$out")
      if (k <= n) out.values.foreach { case (rows, slots) =>
        assert(slots <= rows, s"sizes=$sizes k=$k out=$out")
      }
    }
  }

  test("materializeApportioned picks exactly min(k, N) rows on random corpora") {
    cases.take(20).foreach { case (sizes, k) =>
      val d = sizes.zipWithIndex.flatMap { case (n, i) =>
        (0 until n).map(j => (s"s$i", i * 1000L + j))
      }.toDF("src", "id")
      val picked = Sampling.materializeApportioned(d, col("src"),
        col("id").cast("string"), k).count()
      assert(picked === math.min(k, sizes.sum.toLong), s"sizes=$sizes k=$k")
    }
  }

  test("waterFillBudget: never overspends, caps consistently, saturates when budget covers") {
    cases.foreach { case (sizes, b) =>
      val out = Sampling.waterFillBudget(df(sizes), col("src"), col("tok"), b)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
      val total = sizes.sum.toLong
      assert(out.map(_._2).sum <= b, s"sizes=$sizes b=$b out=${out.toSeq}")
      out.foreach { case (toks, alloc, capped) =>
        assert(alloc >= 0 && alloc <= toks)
        assert((capped == 1) === (alloc < toks), s"capped flag: $toks/$alloc")
      }
      if (b >= total) assert(out.forall(o => o._2 == o._1)) // budget covers all
      // all capped strata sit at ONE water level
      val levels = out.filter(_._3 == 1).map(_._2).distinct
      assert(levels.size <= 1, s"multiple cap levels: ${out.toSeq}")
    }
  }

  test("waterFillBudget is monotone in the budget") {
    cases.take(30).foreach { case (sizes, b) =>
      val lo = Sampling.waterFillBudget(df(sizes), col("src"), col("tok"), b)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val hi = Sampling.waterFillBudget(df(sizes), col("src"), col("tok"), b + 7)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      lo.keys.foreach(k => assert(lo(k) <= hi(k), s"sizes=$sizes b=$b"))
    }
  }

  test("noisedRelease: released within n±32 or withheld, exactly per the k gate") {
    cases.take(30).foreach { case (sizes, kRaw) =>
      val k = 1 + (kRaw % 20).toInt
      val counts = sizes.zipWithIndex.map { case (n, i) => s"s$i" -> n.toLong }.toMap
      val byKey = Profile.noisedRelease(df(sizes), col("src"), k, s"seed$kRaw")
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))).toMap
      byKey.foreach { case (src, (rel, sup)) =>
        val n = counts(src)
        if (n < k) assert(rel.isEmpty && sup == 1)
        else {
          assert(sup == 0)
          assert(rel.exists(v => v >= 0 && math.abs(v - n) <= 32))
        }
      }
    }
  }
}
