package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
  * Skew-join evidence for the 100 TB story: AQE must detect a hot key and
  * split its partition (reference: the engine handles skew by re-batching
  * inside kernels — docsrc caches.rst; on Spark the analog is
  * spark.sql.adaptive.skewJoin). Thresholds are lowered so the sf-test
  * corpus triggers the same code path a 100 TB hot key would.
  */
class SkewJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("AQE splits a skewed join partition (skew=true in final plan)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of the fact rows share one key; dim side is uniform. NOTE: no
      // keyed aggregation downstream of the join - AQE refuses to split a
      // skewed partition when a parent requires hash distribution on the
      // join key, because the split would break it.
      val fact = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
          col("id").as("payload"))
      val dim = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("attr"))
      val joined = fact.join(dim, "k").select(sum(col("attr") + col("payload")).as("s"))
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew split in final adaptive plan:\n${finalPlan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
