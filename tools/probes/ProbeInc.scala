package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch: where did incrementalPairs' fixed overhead come from after the
  * semi-join pruning? Times the full operator plus its stages in
  * isolation on sf0.1 with a persisted index (the ScalingBench harness
  * shape). Dev diagnostics only. */
object ProbeInc {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineContext.session("local[32]", "probe-inc")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = "/root/testdata/sf0.1"
    val batch = spark.range(500L).map(id => (id, ScalingBench.docText(id, 50000L)))
      .toDF("doc_id", "text")
    val existing = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") >= 500L)
    val index0 = Dedup.dedupIndex(existing, "doc_id", "text")
    val bands = index0.bands.persist(); bands.count()
    val sets = index0.sets.persist(); sets.count()
    val index = Dedup.DedupIndex(bands, sets)

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe-inc] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    // warmup
    Dedup.incrementalPairs(index, batch, "doc_id", "text", 0.7).count()
    (1 to 3).foreach { i =>
      time(s"full operator #$i") {
        Dedup.incrementalPairs(index, batch, "doc_id", "text", 0.7)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // hand-built old shape (verify against the UNPRUNED sets union) vs
    // new shape, from the same public pieces
    val inIdx = Dedup.dedupIndex(batch, "doc_id", "text")
    val inSets = inIdx.sets.persist(); inSets.count()
    val inBands = inIdx.bands.persist(); inBands.count()
    val probe = index.bands.as("x").join(inBands.as("y"),
        col("x.sig") === col("y.sig") &&
          least(col("x.gn"), col("y.gn")).cast("double") >=
            lit(0.7) * greatest(col("x.gn"), col("y.gn")))
      .select(col("x.sid").as("id_a"), col("y.sid").as("id_b")).distinct()
    val intra = inBands.as("x").join(inBands.as("y"),
        col("x.sig") === col("y.sig") && col("x.sid") < col("y.sid") &&
          least(col("x.gn"), col("y.gn")).cast("double") >=
            lit(0.7) * greatest(col("x.gn"), col("y.gn")))
      .select(col("x.sid").as("id_a"), col("y.sid").as("id_b")).distinct()
    def candDf = probe.unionByName(intra)
    (1 to 3).foreach { i =>
      time(s"old shape (unpruned) #$i") {
        Dedup.minHashVerify(candDf, index.sets.unionByName(inSets),
            useBroadcastMap = false, 0.7)
          .select(col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 3).foreach { i =>
      time(s"cand only #$i") {
        candDf.write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 3).foreach { i =>
      time(s"new shape inline #$i") {
        val cand = candDf.persist()
        val ids = cand.select(col("id_a").as("sid"))
          .unionByName(cand.select(col("id_b").as("sid"))).distinct()
        val needed = index.sets.unionByName(inSets)
          .join(broadcast(ids), Seq("sid"), "left_semi")
        Dedup.minHashVerify(cand, needed, useBroadcastMap = false, 0.7)
          .select(col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
        cand.unpersist(blocking = false)
      }
    }
    (1 to 3).foreach { i =>
      time(s"semi join, no bcast hint #$i") {
        val cand = candDf.persist()
        val ids = cand.select(col("id_a").as("sid"))
          .unionByName(cand.select(col("id_b").as("sid"))).distinct()
        val needed = index.sets.unionByName(inSets)
          .join(ids, Seq("sid"), "left_semi")
        Dedup.minHashVerify(cand, needed, useBroadcastMap = false, 0.7)
          .select(col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
        cand.unpersist(blocking = false)
      }
    }
    (1 to 3).foreach { i =>
      time(s"isin filter prune #$i") {
        val cand = candDf.persist()
        val ids = cand.select(col("id_a").as("sid"))
          .unionByName(cand.select(col("id_b").as("sid"))).distinct()
          .collect().map(_.getLong(0))
        val needed = index.sets.unionByName(inSets)
          .filter(col("sid").isin(ids.toIndexedSeq: _*))
        Dedup.minHashVerify(cand, needed, useBroadcastMap = false, 0.7)
          .select(col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
        cand.unpersist(blocking = false)
      }
    }
    (1 to 3).foreach { i =>
      time(s"no persist, semi join #$i") {
        val cand = candDf
        val ids = cand.select(col("id_a").as("sid"))
          .unionByName(cand.select(col("id_b").as("sid"))).distinct()
        val needed = index.sets.unionByName(inSets)
          .join(broadcast(ids), Seq("sid"), "left_semi")
        Dedup.minHashVerify(cand, needed, useBroadcastMap = false, 0.7)
          .select(col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 3).foreach { i =>
      val cand = candDf.persist()
      time(s"stage a: persist cand #$i") { cand.count() }
      var ids: Array[Long] = null
      time(s"stage b: collect ids #$i") {
        ids = cand.select(col("id_a").as("sid"))
          .unionByName(cand.select(col("id_b").as("sid"))).distinct()
          .collect().map(_.getLong(0))
      }
      time(s"stage c: pruned verify #$i") {
        val needed = index.sets.unionByName(inSets)
          .filter(col("sid").isin(ids.toIndexedSeq: _*))
        Dedup.minHashVerify(cand, needed, useBroadcastMap = false, 0.7)
          .select(col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"stage c2: pruned verify, lazy cand #$i") {
        val needed = index.sets.unionByName(inSets)
          .filter(col("sid").isin(ids.toIndexedSeq: _*))
        Dedup.minHashVerify(candDf, needed, useBroadcastMap = false, 0.7)
          .select(col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
      }
      cand.unpersist(blocking = true)
    }
    spark.stop()
  }
}
