package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch: attribute incrementalPairs' per-batch cost to its stages at
  * 1× and 10× index scale (the q81 fixed-batch curve). Dev diagnostics
  * only. */
object ProbeInc2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineContext.session("local[24]", "probe-inc2")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val batch = spark.range(500L).map(id => (id, ScalingBench.docText(id, 50000L)))
      .toDF("doc_id", "text")

    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_scaling_10x")) {
      val existing = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).filter(col("doc_id") >= 500L)
      val index0 = Dedup.dedupIndex(existing, "doc_id", "text")
      val bands = index0.bands.persist(); bands.count()
      val sets = index0.sets.persist(); sets.count()
      val index = Dedup.DedupIndex(bands, sets)

      def time(tag: String)(f: => Unit): Unit = {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe-inc2] $dir%-28s $tag%-26s median=${ts.sorted.apply(1)}%6.2f s")
      }

      // full operator
      Dedup.incrementalPairs(index, batch, "doc_id", "text", 0.7).count() // warm
      time("full operator") {
        Dedup.incrementalPairs(index, batch, "doc_id", "text", 0.7)
          .write.format("noop").mode("overwrite").save()
      }

      // stage A: batch index build alone
      time("batch gramSets+bands") {
        val s = Dedup.dedupIndex(batch, "doc_id", "text")
        s.bands.write.format("noop").mode("overwrite").save()
      }

      // stage B: probe join against the 1x/10x band relation
      val inIdx = Dedup.dedupIndex(batch, "doc_id", "text")
      val inBands = inIdx.bands.persist(); inBands.count()
      val probe = index.bands.as("x").join(inBands.as("y"),
          col("x.sig") === col("y.sig") &&
            least(col("x.gn"), col("y.gn")).cast("double") >=
              lit(0.7) * greatest(col("x.gn"), col("y.gn")))
        .select(col("x.sid").as("id_a"), col("y.sid").as("id_b")).distinct()
      time("probe band join") {
        probe.write.format("noop").mode("overwrite").save()
      }

      // stage C: the sets prune scan (isin over the unioned sets)
      val ids = probe.select(col("id_a")).unionByName(probe.select(col("id_b").as("id_a")))
        .distinct().collect().map(_.getLong(0)).toIndexedSeq
      println(s"[probe-inc2] $dir candidate ids = ${ids.length}")
      time("sets isin prune scan") {
        index.sets.unionByName(inIdx.sets)
          .filter(col("sid").isInCollection(ids))
          .write.format("noop").mode("overwrite").save()
      }
      bands.unpersist(blocking = true); sets.unpersist(blocking = true)
      inBands.unpersist(blocking = true)
    }
    spark.stop()
  }
}
