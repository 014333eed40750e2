package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Spark startup ~5s). */
object TestSpark {
  lazy val spark: SparkSession = EngineContext.session("local[4]", "graft-test")
  val sfDir = "/root/testdata/sf0.001"
}
