package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Temporal

/**
 * The native as-of plan operator (AsofJoinPlan → AsofJoinStrategy →
 * AsofJoinExec): held to the same naive-argmax model as the union+window
 * rewrite, plus plan-shape pins that the extension ladder actually
 * engaged (the physical node is in the executed plan; EnsureRequirements
 * supplied the exchanges/sorts the node declared).
 */
class AsofNativeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  private def rowsGen(n: Int, ids: Range): Gen[List[(Long, Long, Int)]] =
    Gen.listOfN(n, Gen.zip(Gen.chooseNum(ids.start, ids.end),
        Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0, 40))))
      .map(_.map { case (i, (k, s)) => (i.toLong, k, s) }.distinctBy(_._1))

  private def sample(seed: Long, n: Int, ids: Range) =
    rowsGen(n, ids)(Gen.Parameters.default, Seed(seed)).get

  test("native as-of ≡ naive argmax under timestamp collisions, both boundary modes") {
    for (seed <- 1L to 4L; inclusive <- Seq(true, false)) {
      val lRows = sample(seed, 60, 0 to 999)
      val rRows = sample(seed + 100, 60, 1000 to 1999)
      val left = lRows.map { case (i, k, s) => (i, k, new Timestamp(base + s * 1000L)) }
        .toDF("lid", "k", "lt")
      val right = rRows.map { case (i, k, s) => (i, k, new Timestamp(base + s * 1000L)) }
        .toDF("rid", "k", "rt")
        .withColumn("m_rid", col("rid"))

      val got = Temporal.asOfJoinNative(left, right,
          leftKey = "k", rightKey = "k", leftTime = "lt", rightTime = "rt",
          payload = Seq("m_rid"), tieBreak = "rid", inclusive = inclusive)
        .select("lid", "m_rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

      val expected = lRows.map { case (lid, lk, ls) =>
        val cands = rRows.filter { case (_, rk, rs) =>
          rk == lk && (if (inclusive) rs <= ls else rs < ls) }
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy { case (rid, _, rs) => (rs, rid) }._1))
      }.toMap
      assert(got === expected, s"seed=$seed inclusive=$inclusive")
    }
  }

  test("native as-of ≡ the union+window rewrite on the q90 corpus shape") {
    val ev = graft.Tables.load(spark, TestSpark.sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_id").as("v_event_id"), col("value").as("v_value"))
    val native = Temporal.asOfJoinNative(purchases, views,
        "user_id", "user_id", "ts", "ts", Seq("v_event_id", "v_value"), "event_id")
      .select("event_id", "v_event_id", "v_value").collect()
      .map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    val rewrite = Temporal.asOfJoin(purchases,
        ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"), col("value")),
        col("user_id"), col("user_id"), col("ts"), col("ts"),
        Seq("v_event_id" -> col("event_id"), "v_value" -> col("value")),
        tieBreak = col("event_id"))
      .select("event_id", "v_event_id", "v_value").collect()
      .map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    assert(native === rewrite)
  }

  test("plan shape: AsofJoinExec present; exchanges/sorts injected by EnsureRequirements; no Join, no Window") {
    val ev = graft.Tables.load(spark, TestSpark.sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_id").as("v_event_id"))
    val df = Temporal.asOfJoinNative(purchases, views,
      "user_id", "user_id", "ts", "ts", Seq("v_event_id"), "event_id")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p.take(3000))
    // the node declared ClusteredDistribution + per-side orderings; the
    // planner must have materialized them as one exchange + sort per side
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p.take(3000))
    assert("Sort ".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct") && !p.contains("Window"), p.take(3000))
  }

  test("left rows with no qualifying right row keep null payload (left-outer)") {
    val left = Seq((1L, 10L, new Timestamp(base)), (2L, 99L, new Timestamp(base)))
      .toDF("lid", "k", "lt")
    val right = Seq((7L, 10L, new Timestamp(base - 1000L)))
      .toDF("rid", "k", "rt").withColumn("m_rid", col("rid"))
    val got = Temporal.asOfJoinNative(left, right,
        "k", "k", "lt", "rt", Seq("m_rid"), "rid")
      .select("lid", "m_rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(1L -> Some(7L), 2L -> None))
  }
}
