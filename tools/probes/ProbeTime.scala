package graft.tools


import graft.SparkEntry

/** Dev scratch: time named queries (args) 3× through the noop sink on
  * SPARK_GRAFT_SF_DIR with Bench's cache hygiene — for targeted perf
  * iteration without the full bench sweep. */
object ProbeTime {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineContext.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { q =>
      spark.catalog.clearCache()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $q%-28s ${ts.map(t => f"$t%.2f").mkString(" ")} s (median ${ts.sorted.apply(1)}%.2f)")
    }
    spark.stop()
  }
}
