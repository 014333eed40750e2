package graft.tools

import org.apache.spark.sql.functions._

import graft.{EngineContext, Tables}
import graft.operators.Dedup

/** Ad-hoc scratch main for plan/semantics probes during development. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = EngineContext.session()
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents").cache()
    docs.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("full minHashLshPairs (fused plan)") {
      val p = Dedup.minHashLshPairs(docs, "doc_id", "text", 0.7)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/q44_plan.txt"),
        p.queryExecution.executedPlan.toString)
      println("n = " + p.count())
    }
    val sigs = time("signatures") {
      val s = Dedup.minHashSignatures(docs, "doc_id", "text").cache()
      s.count(); s
    }
    val cands = time("candidates") {
      val c = Dedup.lshCandidates(sigs).cache()
      println("n_cands = " + c.count()); c
    }
    time("verify") {
      val sets = docs.select(col("doc_id").as("sid"),
        array_distinct(graft.operators.TextHashing.shingles3(col("text"))).as("gs"))
      val j = cands
        .join(broadcast(sets.as("sa")), col("id_a") === col("sa.sid"))
        .join(broadcast(sets.as("sb")), col("id_b") === col("sb.sid"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("sa.gs"), col("sb.gs"))).as("inter"),
          size(col("sa.gs")).as("na"), size(col("sb.gs")).as("nb"))
        .filter(col("inter").cast("double") / (col("na") + col("nb") - col("inter")) >= 0.7)
      println("n_pairs = " + j.count())
    }
    spark.stop()
  }
}
