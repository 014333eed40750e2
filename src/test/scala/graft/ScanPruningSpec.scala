package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
  * Row-group skip-data, asserted by runtime scan METRICS rather than plan
  * text (reference: engine/src/skip_data/SkipDataProcessor.cpp:49-120
  * evaluates min/max metadata per row group to drop chunks before IO; the
  * Spark analog is parquet row-group + page pruning driven by pushed
  * filters). A selective predicate over a key-sorted parquet file must
  * read a small fraction of the rows into the scan — if statistics-based
  * skipping did not fire, the scan would output all rows and only the
  * post-scan Filter would cut them.
  */
class ScanPruningSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def scanOutputRows(plan: SparkPlan): Long = {
    val scans = plan.collect { case s: FileSourceScanExec => s }
    val inner = if (scans.nonEmpty) scans
      else plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        .flatMap(_.collect { case s: FileSourceScanExec => s })
    inner.map(_.metrics("numOutputRows").value).sum
  }

  test("selective predicate on sorted parquet skips most row groups (metrics)") {
    val dir = Files.createTempDirectory("graft_rg").toFile.getAbsolutePath + "/t"
    val n = 400000L
    // small row groups => many groups per file => meaningful skip granularity
    spark.range(n).select(col("id").as("k"), (col("id") % 1000).as("v"))
      .coalesce(2)
      .sortWithinPartitions("k")
      .write.option("parquet.block.size", (128 * 1024).toString).parquet(dir)

    val df = spark.read.parquet(dir).filter(col("k") >= 1000 && col("k") < 2000)
    // collect() (not count()) so THIS queryExecution runs and its scan
    // metrics populate - count() would execute a separate plan copy
    assert(df.collect().length == 1000)

    val physical = df.queryExecution.executedPlan
    val explained = df.queryExecution.toString
    assert(explained.contains("PushedFilters") &&
      explained.contains("GreaterThanOrEqual(k,1000)"), explained.take(2000))
    val scanned = scanOutputRows(physical)
    // without row-group statistics skipping the scan would emit all 400k
    assert(scanned > 0 && scanned < n / 10,
      s"scan emitted $scanned of $n rows - row-group skipping did not fire")
  }

  test("selective predicate on sorted ORC skips most stripes/row-groups (metrics)") {
    // Reference builds the same min/max skip metadata for ORC stripes
    // (engine/src/io/data_parser/metadata/orc_metadata.cpp); the Spark
    // analog is the ORC SearchArgument pushed into the reader
    // (spark.sql.orc.filterPushdown=true), which skips at stripe and
    // row-index-stride granularity.
    val dir = Files.createTempDirectory("graft_orc").toFile.getAbsolutePath + "/t"
    val n = 400000L
    spark.conf.set("spark.sql.orc.filterPushdown", "true")
    // small stripes + fine row index stride => meaningful skip granularity
    spark.range(n).select(col("id").as("k"), (col("id") % 1000).as("v"))
      .coalesce(2)
      .sortWithinPartitions("k")
      .write
      .option("orc.stripe.size", (256 * 1024).toString)
      .option("orc.row.index.stride", "1000")
      .orc(dir)

    val df = spark.read.orc(dir).filter(col("k") >= 1000 && col("k") < 2000)
    assert(df.collect().length == 1000)

    val physical = df.queryExecution.executedPlan
    val explained = df.queryExecution.toString
    assert(explained.contains("PushedFilters") &&
      explained.contains("GreaterThanOrEqual(k,1000)"), explained.take(2000))
    val scanned = scanOutputRows(physical)
    // without stripe/row-group statistics skipping the scan would emit all 400k
    assert(scanned > 0 && scanned < n / 10,
      s"scan emitted $scanned of $n rows - ORC skip-data did not fire")
  }
}
