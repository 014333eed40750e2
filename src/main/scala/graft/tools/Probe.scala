package graft.tools

import graft.{EngineContext, SparkEntry}

/** Ad-hoc scratch main for plan/semantics probes during development. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = EngineContext.session()
    val dir = "/root/testdata/sf0.1"
    val out = new StringBuilder
    for (q <- Seq("q01_tpch_q1", "q03_join3_topk", "q08_join_nonequi",
        "q04_join_left", "q38_events_hourly")) {
      val df = SparkEntry.queries(q)(spark, dir)
      out.append(s"===== $q =====\n")
      out.append(df.queryExecution.executedPlan.toString).append("\n\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/plans.txt"), out.toString)
    println("plans written")
    spark.stop()
  }
}
