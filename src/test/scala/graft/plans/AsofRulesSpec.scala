package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Temporal

/** The injected optimizer rules: filters over left columns commute below
  * the as-of node (and continue into the scan's PushedFilters via the
  * stock rules), and unused payload / right columns are pruned before
  * the right-side exchange. */
class AsofRulesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def buildAsof(payload: Seq[String]) = {
    val ev = graft.Tables.load(spark, TestSpark.sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_id").as("v_event_id"), col("value").as("v_value"),
        col("props").as("v_props"))
    Temporal.asOfJoinNative(purchases, views,
      "user_id", "user_id", "ts", "ts", payload, "event_id")
  }

  test("left-column filter commutes below the node and reaches the scan's PushedFilters") {
    val df = buildAsof(Seq("v_event_id")).filter(col("user_id") < 25)
    val optimized = df.queryExecution.optimizedPlan
    // no Filter remains ABOVE the as-of node
    val top = optimized.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsofJoinPlan] => f
    }
    assert(top.isEmpty, optimized.toString.take(2000))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p.take(3000))
    assert(p.contains("LessThan(user_id,25)"), p.take(3000)) // scan-pushed
  }

  test("a filter mixing left and payload columns splits: left half pushes, payload half stays") {
    val df = buildAsof(Seq("v_value"))
      .filter(col("user_id") < 25 && col("v_value") > 1.0)
    val optimized = df.queryExecution.optimizedPlan
    val topFilter = optimized.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsofJoinPlan] => f
    }
    assert(topFilter.isDefined, optimized.toString.take(2000))
    assert(topFilter.get.condition.references.map(_.name).toSet === Set("v_value"),
      topFilter.get.condition.toString)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LessThan(user_id,25)"), p.take(3000))
  }

  test("unused payload and right columns are pruned before the right-side exchange") {
    val df = buildAsof(Seq("v_event_id", "v_value", "v_props"))
      .select(col("event_id"), col("v_event_id")) // drops v_value, v_props
    val optimized = df.queryExecution.optimizedPlan
    val node = optimized.collectFirst { case a: AsofJoinPlan => a }.get
    assert(node.payload.map(_.name) === Seq("v_event_id"), node.payload.toString)
    // the right child's output no longer carries the dropped columns
    val rightCols = node.right.output.map(_.name).toSet
    assert(!rightCols.contains("v_value") && !rightCols.contains("v_props"), rightCols.toString)
    assert(rightCols === Set("user_id", "ts", "event_id", "v_event_id"), rightCols.toString)
  }

  test("pushed filter changes the plan, never the answer") {
    val unfiltered = buildAsof(Seq("v_event_id"))
    val viaRule = unfiltered.filter(col("user_id") < 10)
      .select("event_id", "v_event_id").collect().map(r => (r.get(0), r.get(1))).toSet
    val manual = unfiltered
      .select("event_id", "user_id", "v_event_id").collect()
      .filter(r => r.getLong(1) < 10).map(r => (r.get(0), r.get(2))).toSet
    assert(viaRule === manual)
  }

  test("exec exposes SQLMetrics: output rows = left rows, matched <= output") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = buildAsof(Seq("v_event_id"))
    val rows = df.collect().length.toLong // executes THIS queryExecution
    def find(p: SparkPlan): Option[AsofJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(q.plan)
      case e: AsofJoinExec => Some(e)
      case other => other.children.view.flatMap(find(_)).headOption
    }
    val exec = find(df.queryExecution.executedPlan).get
    assert(exec.metrics.contains("numOutputRows") &&
      exec.metrics.contains("numMatchedRows"))
    val out = exec.metrics("numOutputRows").value
    val matched = exec.metrics("numMatchedRows").value
    assert(out == rows, s"out=$out rows=$rows")
    assert(matched > 0 && matched <= out, s"matched=$matched out=$out")
  }
}
