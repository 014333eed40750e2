package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Engine telemetry as a queryable table — the analog of `bc.log(sql)`
 * (reference context.py:3346-3608, which exposes the engine's own logs as
 * a queryable relation, per-query row counts included). Implemented with
 * Spark's QueryExecutionListener: every completed action on the session
 * records (time, duration, output rows, status, error) into a bounded
 * in-memory buffer; `table()` returns it as a DataFrame so it can be
 * joined/filtered like any table.
 */
class QueryLog(spark: SparkSession, maxEntries: Int = 10000) {
  import QueryLog.Entry

  private val entries = new ConcurrentLinkedQueue[Entry]()

  private val listener = new QueryExecutionListener {
    private def head(qe: QueryExecution): String = {
      val s = qe.optimizedPlan.toString
      s.linesIterator.take(1).mkString.take(200)
    }
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      add(Entry(System.currentTimeMillis(), funcName, durationNs / 1e6,
        QueryLog.outputRows(qe.executedPlan).getOrElse(-1L), "success", "", head(qe)))
    override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit =
      add(Entry(System.currentTimeMillis(), funcName, 0.0, -1L, "failed",
        String.valueOf(error.getMessage).take(500), head(qe)))
  }

  private def add(e: Entry): Unit = {
    entries.add(e)
    while (entries.size() > maxEntries) entries.poll()
  }

  spark.listenerManager.register(listener)

  /** Operator-supplied annotation row (r15 verdict #5): pipelines record
    * WHY-decisions (e.g. the dedup probe's recommendation) NEXT TO the
    * query rows the listener captures, so the run's record carries its
    * own attribution — the reference's bc.log takes engine-side log lines
    * the same way. `detail` lands in plan_head (the free-text column);
    * status is "note" so consumers can filter annotations from actions. */
  def annotate(func: String, detail: String, rows: Long = -1L): Unit =
    add(Entry(System.currentTimeMillis(), func, 0.0, rows, "note", "",
      detail.take(500)))

  /** The log as a queryable DataFrame. */
  def table(): DataFrame = {
    import spark.implicits._
    entries.asScala.toSeq.toDF()
  }

  def clear(): Unit = entries.clear()

  def close(): Unit = spark.listenerManager.unregister(listener)
}

object QueryLog {
  // top-level (object-nested) so Spark can derive an Encoder for it
  final case class Entry(
      ts_ms: Long, func: String, duration_ms: Double, rows: Long,
      status: String, error: String, plan_head: String)

  /** Output row count of an EXECUTED plan, read from its metrics: the
    * numOutputRows of the root-most node that carries one. AQE roots
    * unwrap to their final physical plan, and query-stage wrappers —
    * LEAF nodes whose real subtree hangs off `plan` — are descended
    * through. None when no node on the root path carries the metric (pure
    * commands); best-effort by nature — the value is the executed metric,
    * not a recount. */
  def outputRows(plan: SparkPlan): Option[Long] = {
    def find(p: SparkPlan): Option[Long] = {
      val q = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => s.plan
        case other => other
      }
      if (!(q eq p)) find(q)
      else q.metrics.get("numOutputRows").map(_.value)
        .orElse(q.children.view.flatMap(find).headOption)
    }
    find(plan)
  }
}
