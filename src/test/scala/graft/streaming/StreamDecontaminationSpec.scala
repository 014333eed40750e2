package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Decontamination

/**
  * Stream-static decontamination parity: CurationStreams.contaminatedIds
  * over a bounded file stream of the q72 corpus must flag EXACTLY the doc
  * ids that the batch Decontamination.contaminationReport (the
  * q72-oracle-verified operator) flags. The stream side is the shape a
  * production pipeline runs while a crawl lands — incoming docs checked
  * against a static eval-set gram relation via a stream-static left-semi
  * join (append mode, no stateful aggregation beyond per-id dedup).
  */
class StreamDecontaminationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stream-static contaminatedIds equals the batch contamination set") {
    // Same corpus construction as q72: eval slice excluded from the
    // corpus, planted leaked copies with a window-shifting prefix.
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val evalSet = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      .unionByName(evalSet.select((col("doc_id") + 200000L).as("doc_id"),
        concat(lit("leaked copy "), col("text")).as("text")))

    val batchIds = Decontamination
      .contaminationReport(corpus, evalSet, "doc_id", "text", 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchIds.nonEmpty) // planted leaks must be detected

    // Static side computed once; persist so per-batch re-plans reuse it.
    val evalGrams = CurationStreams.evalGramSet(evalSet, "text", 8).persist()
    try {
      // Stage the corpus as a parquet directory and stream it back in —
      // multiple files so the run spans >1 micro-batch worth of splits.
      val dir = java.nio.file.Files.createTempDirectory("graft_decontam").toString
      corpus.repartition(4).write.mode("overwrite").parquet(dir)
      val schema = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(dir)

      val q = CurationStreams.contaminatedIds(stream, evalGrams, "doc_id", "text", 8)
        .writeStream.format("memory").queryName("decontam_stream")
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        val streamedIds = spark.table("decontam_stream")
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(streamedIds == batchIds)
      } finally q.stop()
    } finally evalGrams.unpersist()
  }
}
