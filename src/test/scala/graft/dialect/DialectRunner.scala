package graft.dialect

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession

import graft.EngineContext

/** Outcome of one E2E suite SQL through the engine. */
final case class DialectResult(
    test: E2eTest,
    nulls: Boolean,
    phase: String, // "ok" | "plan" | "exec" | "expected-error" | "unexpected-pass"
    error: String)

/**
  * Runs every SQL string from the reference's 48 E2E suites through
  * EngineContext.sql on the full-schema synthetic catalog, both the plain
  * and WITH_NULLS variants: analysis + physical planning, then execution
  * to a noop sink. MESSAGE_VALIDATION tests must FAIL analysis (they are
  * the reference's error-message tests). Produces DIALECT_COMPAT.md.
  *
  * Shared by DialectCompatSpec (the gate) and the Test/runMain entry
  * (report regeneration): `Test/runMain graft.dialect.DialectRunner`.
  */
object DialectRunner {

  def run(spark: SparkSession, nulls: Boolean): Seq[DialectResult] = {
    ReferenceTables.register(spark, nulls)
    val ctx = new EngineContext(spark)
    E2eSuites.load().map { t =>
      val attempt = Try {
        val df = ctx.sql(t.sql)
        df.queryExecution.executedPlan // force analysis + physical planning
        df.write.format("noop").mode("overwrite").save() // force execution
      }
      (t.expectError, attempt) match {
        case (false, Success(_)) => DialectResult(t, nulls, "ok", "")
        case (false, Failure(e)) =>
          val phase = if (e.isInstanceOf[org.apache.spark.sql.AnalysisException]) "plan" else "exec"
          DialectResult(t, nulls, phase, firstLine(e))
        case (true, Failure(_)) => DialectResult(t, nulls, "expected-error", "")
        case (true, Success(_)) => DialectResult(t, nulls, "unexpected-pass", "")
      }
    }
  }

  private def firstLine(e: Throwable): String = {
    val m = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
    m.linesIterator.take(2).mkString(" / ").take(300)
  }

  def report(results: Seq[DialectResult]): String = {
    val sb = new StringBuilder
    sb ++= "# DIALECT_COMPAT — reference E2E suites through EngineContext.sql\n\n"
    sb ++= "Source: /root/reference/tests/BlazingSQLTest/EndToEndTests/TestSuites/*.yaml\n"
    sb ++= "(48 suites). Every `SQL:` block runs against the full-schema synthetic\n"
    sb ++= "TPC-H catalog (ReferenceTables, mirroring createSchema.py), in both the\n"
    sb ++= "plain and WITH_NULLS variants: analysis -> physical plan -> execution to\n"
    sb ++= "a noop sink. MESSAGE_VALIDATION tests must fail analysis.\n\n"
    val bySuite = results.groupBy(_.test.suite).toSeq.sortBy(_._1)
    val good = Set("ok", "expected-error")
    sb ++= "| suite | queries | pass | fail |\n|---|---|---|---|\n"
    for ((suite, rs) <- bySuite) {
      val n = rs.size
      val pass = rs.count(r => good(r.phase))
      sb ++= s"| $suite | $n | $pass | ${n - pass} |\n"
    }
    val total = results.size
    val pass = results.count(r => good(r.phase))
    sb ++= s"\n**Total: $pass / $total pass** (each query counted once per nulls variant).\n"
    val fails = results.filterNot(r => good(r.phase))
    if (fails.nonEmpty) {
      sb ++= "\n## Failures\n\n"
      for (f <- fails)
        sb ++= s"- `${f.test.suite}/${f.test.name}`${if (f.nulls) " [nulls]" else ""} (${f.phase}): ${f.error}\n"
    }
    sb.result()
  }

  def main(args: Array[String]): Unit = {
    val spark = EngineContext.session("local[8]", "graft-dialect")
    val results = run(spark, nulls = false) ++ run(spark, nulls = true)
    val md = report(results)
    Files.write(Paths.get("/root/repo/DIALECT_COMPAT.md"), md.getBytes(StandardCharsets.UTF_8))
    val fails = results.filterNot(r => Set("ok", "expected-error")(r.phase))
    println(s"pass=${results.size - fails.size} fail=${fails.size} -> DIALECT_COMPAT.md")
    fails.groupBy(_.error).toSeq.sortBy(-_._2.size).take(25).foreach { case (e, rs) =>
      println(s"${rs.size}x  ${rs.take(3).map(r => r.test.suite + "/" + r.test.name).mkString(",")}  $e")
    }
    spark.stop()
  }
}
