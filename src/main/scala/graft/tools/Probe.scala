package graft.tools

import graft.{EngineContext, SparkEntry}

/** Ad-hoc scratch main for plan/semantics probes during development. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = EngineContext.session()
    // Drive the driver-facing flagship entry end-to-end (smoke contract).
    val df = SparkEntry.entry(spark)
    df.show(10, truncate = false)
    println(s"entry rows = ${df.count()}")
    spark.stop()
  }
}
