package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sanity invariants per operator family, on sf0.001. (Exact value
  * correctness is the DuckDB oracle's job — graft.Verify + the driver's
  * compare; these tests pin structural semantics.) */
class QueryPackSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("every registered query has matching oracle coverage and runs") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os.diff(qs)}")
    assert(qs == os, s"queries without oracle (rows-only fallback): ${qs.diff(os)}")
  }

  test("bench headline and scaling sweep reference only registered queries") {
    // a typo'd name here would crash the DRIVER's bench capture, not CI
    val qs = SparkEntry.queries.keySet
    val badBench = Bench.headline.filterNot(qs.contains)
    assert(badBench.isEmpty, s"headline entries without queries: $badBench")
    val badSweep = graft.tools.ScalingBench.sweep.filterNot(qs.contains)
    assert(badSweep.isEmpty, s"scaling sweep entries without queries: $badSweep")
  }

  test("q01 TPC-H Q1: 6 groups, aggregates positive, sorted by flag/status") {
    val rows = run("q01_tpch_q1").collect()
    assert(rows.length == 6)
    assert(rows.map(r => (r.getString(0), r.getString(1))).sameElements(
      rows.map(r => (r.getString(0), r.getString(1))).sorted))
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
  }

  test("join family invariants: semi + anti partition the orders/customer space") {
    val c = Tables.load(spark, TestSpark.sfDir, "customer")
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(semi + anti == c.count())
  }

  test("q06 full outer join keeps unmatched rows from both sides") {
    val rows = run("q06_join_full").collect()
    assert(rows.exists(r => r.getAs[Boolean]("has_cust") && !r.getAs[Boolean]("has_ord")))
    assert(rows.exists(r => !r.getAs[Boolean]("has_cust") && r.getAs[Boolean]("has_ord")))
  }

  test("q09 null-safe join matches null keys to null keys") {
    val rows = run("q09_join_nullsafe").collect()
    // bucket -1 is the null<=>null group and must be present
    assert(rows.exists(_.getAs[Int]("bucket") == -1))
  }

  test("q19 null ordering: nulls sort last under ASC NULLS LAST") {
    val grps = run("q19_orderby_nulls_limit").collect().map(r => Option(r.get(1)))
    val firstNull = grps.indexWhere(_.isEmpty)
    if (firstNull >= 0) assert(grps.drop(firstNull).forall(_.isEmpty))
  }

  test("q32 window row_number: at most 3 rows per nation, rn dense from 1") {
    val rows = run("q32_window_rownum").collect()
    val byNation = rows.groupBy(_.getAs[Int]("c_nationkey"))
    byNation.values.foreach { g =>
      assert(g.length <= 3)
      assert(g.map(_.getAs[Int]("rn")).sorted.sameElements(1 to g.length))
    }
  }

  test("q34 window frame: moving count never exceeds frame size 3") {
    val rows = run("q34_window_frame").collect()
    assert(rows.forall(_.getAs[Long]("mov_n") <= 3))
    assert(rows.forall(r => r.getAs[Double]("mov_min") <= r.getAs[Double]("mov_max")))
  }

  test("q39 sessionization: session counts are positive and bounded by events") {
    val rows = run("q39_events_sessionize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1)
      assert(r.getAs[Long]("n_sessions") == r.getAs[Long]("n_session_rows"))
    }
  }
}
