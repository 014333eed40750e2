package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
  * The Hive-metastore table path (reference: bc.create_table(name,
  * hive_cursor) — pyblazing/apiv2/hive.py:177 get_hive_table reads
  * location/schema/partition metadata through a HiveServer2 cursor,
  * context.py:2212-2247 registers the files with that partition info).
  * Here the metastore is the session catalog itself (enableHiveSupport +
  * embedded Derby metastore under target/): createTableHive(name, "db.t")
  * must surface the metastore table under the engine name, and a partition
  * predicate must prune at the metastore/partition level — asserted by
  * scan metrics, not just plan text.
  */
class HiveMetastoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def fileScans(plan: SparkPlan): Seq[FileSourceScanExec] = {
    val direct = plan.collect { case s: FileSourceScanExec => s }
    if (direct.nonEmpty) direct
    else plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
      .flatMap(_.collect { case s: FileSourceScanExec => s })
  }

  test("createTableHive registers a partitioned metastore table; partition predicate prunes the scan") {
    val dir = Files.createTempDirectory("graft_hive").toFile.getAbsolutePath + "/t"
    spark.range(100)
      .select(col("id"), (col("id") % 4).cast("string").as("p"))
      .write.partitionBy("p").parquet(dir)

    spark.sql("DROP TABLE IF EXISTS graft_hmeta")
    spark.sql(
      s"""CREATE EXTERNAL TABLE graft_hmeta (id BIGINT)
         |PARTITIONED BY (p STRING) STORED AS PARQUET LOCATION '$dir'""".stripMargin)
    // discover the four hive-style partition dirs into the metastore
    spark.sql("MSCK REPAIR TABLE graft_hmeta")

    val ctx = new EngineContext(spark)
    ctx.createTableHive("hpart", "default.graft_hmeta")

    val df = ctx.sql("SELECT count(*) AS n FROM hpart WHERE p = '1'")
    assert(df.collect()(0).getLong(0) == 25L)

    // the same predicate as a row query, so scan metrics show pruning:
    // only the p=1 partition's 25 rows may leave the scan
    val rows = ctx.sql("SELECT id FROM hpart WHERE p = '1'")
    assert(rows.collect().length == 25)
    val explained = rows.queryExecution.toString
    assert(explained.contains("PartitionFilters") && explained.contains("(p"),
      explained.take(2000))
    val scanned = fileScans(rows.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
    assert(scanned == 25L,
      s"scan emitted $scanned of 100 rows — metastore partition pruning did not fire")

    // catalog surface: the metastore table is visible and describable
    assert(ctx.describeTable("hpart").map(_._1) == Seq("id", "p"))
    spark.sql("DROP TABLE graft_hmeta")
  }

  test("user partitions kwarg restricts registration to the named partitions") {
    val dir = Files.createTempDirectory("graft_hive_up").toFile.getAbsolutePath + "/t"
    spark.range(100)
      .select(col("id"), (col("id") % 4).cast("string").as("p"))
      .write.partitionBy("p").parquet(dir)
    spark.sql("DROP TABLE IF EXISTS graft_hmeta_up")
    spark.sql(
      s"""CREATE EXTERNAL TABLE graft_hmeta_up (id BIGINT)
         |PARTITIONED BY (p STRING) STORED AS PARQUET LOCATION '$dir'""".stripMargin)
    spark.sql("MSCK REPAIR TABLE graft_hmeta_up")

    // reference: create_table(name, hive_cursor, partitions={'p': [...]})
    // registers ONLY those partitions' files
    // (pyblazing/apiv2/hive.py:113-175 filterHivePartitionsWithUserPartitions)
    val ctx = new EngineContext(spark)
    ctx.createTableHive("hpart_sub", "default.graft_hmeta_up",
      Map("p" -> Seq("0", "2")))

    // an UNFILTERED query over the registered name sees only 2 of the 4
    // partitions — the restriction is part of the table, not the query
    val all = ctx.sql("SELECT id FROM hpart_sub")
    assert(all.collect().length == 50)
    // and it prunes at the scan, not post-scan: only 50 rows leave the scan
    val scanned = fileScans(all.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
    assert(scanned == 50L,
      s"scan emitted $scanned of 100 rows — user-partition restriction did not prune")
    // distinct partition values confirm which partitions survived
    val ps = ctx.sql("SELECT DISTINCT p FROM hpart_sub").collect().map(_.getString(0)).sorted
    assert(ps.sameElements(Array("0", "2")))
    spark.sql("DROP TABLE graft_hmeta_up")
  }
}
