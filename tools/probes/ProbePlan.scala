package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev scratch: dump executed plans for named queries (args = query names). */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
