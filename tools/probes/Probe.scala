package graft.tools

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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    Dedup.exactDuplicates(docs, "doc_id", "text").count() // warmup
    // stage-by-stage cost decomposition of the q44 pipeline
    val sets = Dedup.gramSets(docs, "doc_id", "text").persist()
    time("1 gram-set scan (persist+count)")(sets.count())
    time("2 signatures only (off cached sets)")(noop(Dedup.signaturesFromSets(sets)))
    time("3 band join + distinct (candidates)")(
      println("  cands = " + Dedup.lshCandidates(Dedup.signaturesFromSets(sets)).count()))
    time("3b band join + size prefilter + distinct")(
      println("  cands = " + Dedup.lshCandidates(Dedup.signaturesFromSets(sets), 0.7).count()))
    sets.unpersist(true)
    time("4 full minHashLshPairs cold") {
      println("  n = " + Dedup.minHashLshPairs(docs, "doc_id", "text", 0.7).count())
    }
    time("5 full minHashLshPairs warm") {
      println("  n = " + Dedup.minHashLshPairs(docs, "doc_id", "text", 0.7).count())
    }
    spark.stop()
  }
}
