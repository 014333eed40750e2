package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Sketches, TextAnalysis}

/** Dev scratch: stage attribution for q111 (CMS heavy hitters). */
object ProbeCms {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineContext.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[cms] $name%-28s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    time("explode only") {
      toks.write.format("noop").mode("overwrite").save()
    }
    time("explode+md5") {
      toks.select(md5(col("tok"))).write.format("noop").mode("overwrite").save()
    }
    time("explode+md5+4slices") {
      toks.select(md5(col("tok")).as("hx"))
        .select(array((0 until 4).map(j =>
          TextAnalysis.hexParse(col("hx"), 1 + 8 * j, 8) % 512): _*))
        .write.format("noop").mode("overwrite").save()
    }
    time("sketch groupBy") {
      toks.select(md5(col("tok")).as("hx"))
        .select(posexplode(array((0 until 4).map(j =>
          TextAnalysis.hexParse(col("hx"), 1 + 8 * j, 8) % 512): _*)).as(Seq("j", "cell")))
        .groupBy("j", "cell").count()
        .write.format("noop").mode("overwrite").save()
    }
    time("exact top20") {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n_exact").desc, col("tok"))
      toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 20)
        .write.format("noop").mode("overwrite").save()
    }
    time("full q111") {
      Sketches.cmsHeavyHitters(toks, col("tok"), 4, 512, 20)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
