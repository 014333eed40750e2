package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Explicit salting (operators.Skew): answer-equality vs the unsalted
  * forms (the oracle restates it in DuckDB; this pins it in-engine on
  * the same session) and the plan shapes the rewrite exists to produce. */
class SkewSaltSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import graft.Tables.load

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString

  test("salted join result set-equals the plain join") {
    val orders = load(spark, TestSpark.sfDir, "orders")
    val cust = load(spark, TestSpark.sfDir, "customer")
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", "c_custkey",
        salts = 8, saltSource = col("o_orderkey"))
      .select("o_orderkey", "c_custkey", "c_mktsegment")
    val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey", "c_mktsegment")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q119 plan: small side replicated by Generate, join carries the salt key") {
    val p = plan("q119_salted_join")
    assert(p.contains("Generate explode"), p.take(3000)) // the ×salts replication
    assert(p.contains("__salt"), p.take(3000))           // routing key in the join
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("salted partition sum equals the window form (exact integer totals)") {
    val docs = load(spark, TestSpark.sfDir, "documents")
    val salted = Skew.saltedPartitionSum(docs, col("source"), col("n_chars"),
        salts = 8, saltSource = col("doc_id"), totalName = "tot")
      .select(col("doc_id"), col("tot"))
    val windowed = docs.select(col("doc_id"),
      sum(col("n_chars")).over(Window.partitionBy(col("source"))).as("tot"))
    assert(salted.exceptAll(windowed).isEmpty && windowed.exceptAll(salted).isEmpty)
  }

  test("salted partition sum keeps null-key rows, matching window semantics") {
    import spark.implicits._
    val df = Seq((1L, Some("a"), 10L), (2L, None, 5L), (3L, None, 7L),
      (4L, Some("a"), 2L)).toDF("id", "k", "v")
    val out = Skew.saltedPartitionSum(df, col("k"), col("v"),
        salts = 4, saltSource = col("id"), totalName = "tot")
      .select("id", "tot").as[(Long, Long)].collect().toMap
    // NULL is its own partition, exactly as PARTITION BY treats it
    assert(out == Map(1L -> 12L, 4L -> 12L, 2L -> 12L, 3L -> 12L))
  }

  test("q120 plan: no Window operator, totals broadcast back onto the corpus") {
    val p = plan("q120_salted_window")
    assert(!p.contains("Window"), p.take(3000))          // the operator we avoided
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the big side reaches the join scan-direct: its only exchange is the
    // broadcast build side's; no shuffle of `documents` on `source`
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }
}
