package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

/**
  * Streaming incremental near-dup parity: CurationStreams.nearDupPairs
  * (stream-static band probe + row-local array verify) over a bounded
  * file stream must find exactly the PROBE-side pairs that the batch
  * Dedup.incrementalPairs finds for the same batch against the same
  * index — the q81 arrival path, re-shaped for append-mode streaming.
  */
class StreamNearDupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("streaming nearDupPairs equals incrementalPairs' probe side") {
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // planted arrivals: byte-identical copies of every 7th doc, new ids
    val batch = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ndp").toString
    batch.write.mode("overwrite").parquet(dir)

    val idx = Dedup.dedupIndex(docs, "doc_id", "text")
    val bands = idx.bands.persist(); bands.count()
    val sets = idx.sets.persist(); sets.count()
    val index = Dedup.DedupIndex(bands, sets)
    try {
      val stream = spark.readStream.schema(batch.schema).parquet(dir)
      val q = CurationStreams.nearDupPairs(stream, index, "doc_id", "text", 0.7)
        .writeStream.format("memory").queryName("ndp_parity")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("ndp_parity").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        // probe-side pairs only: within-batch pairs are documented as the
        // batch operator's job (stream-stream self-joins are out of scope)
        val batchPairs = Dedup.incrementalPairs(index, batch, "doc_id", "text", 0.7)
          .filter(col("id_a") < 100000L).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(streamed.nonEmpty)
        assert(streamed == batchPairs)
        // every planted copy is found against its original
        assert(streamed.exists { case (a, b) => b == a + 100000L })
      } finally q.stop()
    } finally {
      bands.unpersist(blocking = false)
      sets.unpersist(blocking = false)
    }
  }
}
