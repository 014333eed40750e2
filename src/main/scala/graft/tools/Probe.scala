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
    Dedup.exactDuplicates(docs, "doc_id", "text").count() // warmup
    val sets = time("gramSets persist+count") {
      val s = Dedup.gramSets(docs, "doc_id", "text").persist()
      println("sets rows = " + s.count()); s
    }
    sets.unpersist(true)
    time("full minHashLshPairs cold") {
      println("n = " + Dedup.minHashLshPairs(docs, "doc_id", "text", 0.7).count())
    }
    time("full minHashLshPairs warm") {
      println("n = " + Dedup.minHashLshPairs(docs, "doc_id", "text", 0.7).count())
    }
    time("full shuffle fallback") {
      println("n = " + Dedup.minHashLshPairs(docs, "doc_id", "text", 0.7, 0L).count())
    }
    spark.stop()
  }
}
