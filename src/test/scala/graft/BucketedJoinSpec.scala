package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
  * Co-located join via bucketing (ROADMAP #4, 100 TB story): when both
  * fact tables are bucketed AND sorted by the join key with the same
  * bucket count, the sort-merge join needs NO Exchange and NO Sort — the
  * scan layout IS the join layout. This is the Spark analog of the
  * reference pre-partitioning inputs across workers before a
  * distributed join (BatchJoinProcessing hash-partition kernels): pay the
  * shuffle once at write time, reuse it on every subsequent join.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("bucketed tables join with no Exchange below the join") {
    val dir = Files.createTempDirectory("graft_bucket").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // coalesce(1): ONE file per bucket, or the reader cannot trust the
    // per-bucket sort order and reinstates a Sort before the merge join
    spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet").coalesce(1)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/orders_b").saveAsTable("orders_b")
    spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet").coalesce(1)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/lineitem_b").saveAsTable("lineitem_b")

    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .select(sum(col("l_quantity")).as("q"))
      val rows = joined.collect()
      assert(rows(0).getDouble(0) > 0)
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last // below the agg: scans + join
      assert(joinSection.contains("SortMergeJoin"), plan.take(3000))
      assert(joinSection.contains("Bucketed: true"), plan.take(3000))
      // The Exchange (the cost that scales with data volume) is gone. A
      // per-bucket Sort remains: Spark 3+ ignores the written sort order
      // unless spark.sql.legacy.bucketedTableScan.outputOrdering is set —
      // that sort is partition-local and spill-free, not a shuffle.
      assert(!joinSection.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(3000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
