package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.SimilaritySearch

/**
  * Stream-static semantic-dedup parity: CurationStreams.semanticDupIds
  * over a bounded file stream of new vectors must flag EXACTLY the ids
  * the equivalent batch computation flags against the same pre-built
  * k-means index. The stream side is the incremental-ingest shape — new
  * crawl embeddings checked against an already-clustered corpus, one
  * cluster's members per incoming vector, no corpus re-scan.
  */
class StreamSemanticDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stream-static semanticDupIds equals the batch duplicate set") {
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") < 400)
    val incoming = emb.filter(col("vec_id") >= 400)

    // Build the static index once: centroids + clustered corpus.
    val cents = SimilaritySearch.kmeansCentroids(corpus, 4, 1).persist()
    val index = SimilaritySearch.kmeansAssign(corpus, 4, 1)
      .select("vec_id", "embedding", "cid").persist()
    try {
      // Batch reference: same assignment, same cluster-bounded compare.
      val batchIds = SimilaritySearch.assignToCentroids(incoming, cents)
        .join(index.select(col("cid"), col("embedding").as("iv")), Seq("cid"))
        .filter(round(SimilaritySearch.cosine(col("embedding"), col("iv")), 6) >= 0.4)
        .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
      assert(batchIds.nonEmpty) // the 0.4 tail must exist at this SF

      val dir = java.nio.file.Files.createTempDirectory("graft_semdedup").toString
      incoming.repartition(4).write.mode("overwrite").parquet(dir)
      val schema = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(dir)

      val q = CurationStreams.semanticDupIds(stream, index, cents, 0.4)
        .writeStream.format("memory").queryName("semdedup_stream")
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        val streamedIds = spark.table("semdedup_stream")
          .select("vec_id").collect().map(_.getLong(0)).toSet
        assert(streamedIds == batchIds)
      } finally q.stop()
    } finally { cents.unpersist(); index.unpersist() }
  }
}
