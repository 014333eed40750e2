package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/**
  * Stream-static LM scoring parity: documents STREAMED through
  * TextAnalysis.scoreWithBackoffLm against a static pruned backoff LM
  * (trained once, batch-side) must score exactly as the batch operator —
  * the production shape where a crawl lands against a shipped LM. The
  * scoring side is three stream-static left joins + one per-doc
  * aggregation (Complete mode), no corpus aggregation in-stream; OOV
  * tokens (impossible self-scored, routine for a stream vs a fixed
  * reference) take the hapax ceiling, pinned here with planted unseen
  * words.
  */
class StreamLmScoringSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("streamed scoring against a static LM equals batch, incl. OOV docs") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // LM trained on a REFERENCE slice; the scored set includes docs the
    // LM never saw plus one planted all-OOV doc
    val reference = docs.filter(col("doc_id") % 3 =!= 0)
    val scoredSet = docs.filter(col("doc_id") % 3 === 0).limit(50)
      .unionByName(Seq((990001L, "zzqx zzqy zzqz zzqw"))
        .toDF("doc_id", "text"))

    val lm = TextAnalysis.trainBackoffLm(reference, "text")
    val pinned = TextAnalysis.BackoffLm(
      lm.triScored.persist(), lm.biScored.persist(), lm.uniScored.persist())
    try {
      val batch = TextAnalysis
        .scoreWithBackoffLm(scoredSet, "doc_id", "text", pinned)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      assert(batch.contains(990001L))
      // the planted doc is pure OOV: every trigram lands on the uni path
      assert(batch(990001L)._4 === batch(990001L)._1)

      val dir = java.nio.file.Files.createTempDirectory("graft_lmscore").toString
      scoredSet.repartition(3).write.mode("overwrite").parquet(dir)
      val schema = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = TextAnalysis.scoreWithBackoffLm(stream, "doc_id", "text", pinned)
        .writeStream.format("memory").queryName("lm_stream")
        .outputMode(OutputMode.Complete()).start()
      try q.processAllAvailable() finally q.stop()

      val streamed = spark.table("lm_stream")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      assert(streamed === batch)
    } finally {
      pinned.triScored.unpersist(blocking = false)
      pinned.biScored.unpersist(blocking = false)
      pinned.uniScored.unpersist(blocking = false)
    }
  }
}
