package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.operators.Decontamination

/** Dev scratch: where does q72's time go at sf0.1? Prints the executed
  * plan and times the stages separately. Not part of any contract. */
object ProbeDecontam {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("probe-decontam").getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val evalSet = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      .unionByName(evalSet.select((col("doc_id") + 200000L).as("doc_id"),
        concat(lit("leaked copy "), col("text")).as("text")))

    def t(label: String)(f: => Long): Unit = {
      val s = System.nanoTime(); val n = f
      println(f"$label%-40s ${(System.nanoTime - s) / 1e9}%6.2f s  (n=$n)")
    }
    // warm the scan
    t("scan only")(corpus.count())
    t("gram arrays only") {
      corpus.select(Decontamination.tokenGramFingerprints(col("text"), 8).as("gs"))
        .selectExpr("sum(size(gs))").collect()(0).getLong(0)
    }
    t("explode, no size carried") {
      corpus.select(col("doc_id"),
        explode(Decontamination.tokenGramFingerprints(col("text"), 8)).as("g")).count()
    }
    t("size + explode (q72 shape)") {
      corpus.select(col("doc_id").as("cid"),
          Decontamination.tokenGramFingerprints(col("text"), 8).as("gs"))
        .select(col("cid"), size(col("gs")).as("n_grams"), explode(col("gs")).as("g"))
        .count()
    }
    t("explode_outer (no inferred filter)") {
      corpus.select(col("doc_id").as("cid"),
          Decontamination.tokenGramFingerprints(col("text"), 8).as("gs"))
        .select(col("cid"), size(col("gs")).as("n_grams"), explode_outer(col("gs")).as("g"))
        .filter(col("g").isNotNull)
        .count()
    }
    t("retain array through Generate, size after") {
      corpus.select(col("doc_id").as("cid"),
          Decontamination.tokenGramFingerprints(col("text"), 8).as("gs"))
        .select(col("cid"), col("gs"), explode(col("gs")).as("g"))
        .select(col("cid"), size(col("gs")).as("n_grams"), col("g"))
        .count()
    }
    t("full report") {
      Decontamination.contaminationReport(corpus, evalSet, "doc_id", "text", 8).count()
    }
    val rep = Decontamination.contaminationReport(corpus, evalSet, "doc_id", "text", 8)
    println(rep.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
