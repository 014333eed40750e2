package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Resource lifecycle of the MinHash-LSH pipeline: the reference frees its
  * CacheMachines when the execution graph finishes
  * (engine/src/cache_machine/CacheMachine.cpp); the Spark analog is that
  * every corpus-sized intermediate — the persisted gram-set scan and the
  * verify broadcast — is released before the pipeline returns, and the
  * managed handle's close() drops the (small) materialized result too, so
  * a long-lived session running many dedups accumulates NO storage.
  */
class DedupLifecycleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
    (3L, "completely different content about spark query engines and shuffles")
  ).toDF("doc_id", "text")

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("managed broadcast path: intermediates freed before return, close() leaves zero storage") {
    val before = persistedIds
    val h = Dedup.minHashLshPairsManaged(docs, "doc_id", "text", 0.7)
    // the broadcast was destroyed before the handle came back
    assert(Dedup.liveVerifyBroadcasts == 0)
    // the ONLY surviving storage is the materialized result itself
    val during = persistedIds -- before
    assert(during.size == 1, s"expected just the result blocks, got RDDs $during")
    // result is materialized and correct despite the released intermediates
    val pairs = h.df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    h.close()
    assert((persistedIds -- before).isEmpty,
      "storage residue after close() — the pipeline must leave nothing cached")
  }

  test("managed shuffle-fallback path releases the gram-set scan and closes clean") {
    val before = persistedIds
    // budget 0 forces the SHUFFLE_HASH verify fallback (the q44b path)
    val h = Dedup.minHashLshPairsManaged(docs, "doc_id", "text", 0.7, broadcastBudgetBytes = 0L)
    assert(Dedup.liveVerifyBroadcasts == 0)
    val during = persistedIds -- before
    assert(during.size == 1, s"expected just the verify checkpoint, got RDDs $during")
    assert(h.df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet.contains((0L, 1L)))
    h.close()
    assert((persistedIds -- before).isEmpty)
  }

  test("return-and-forget path keeps only result blocks and stays usable") {
    val before = persistedIds
    val df = Dedup.minHashLshPairs(docs, "doc_id", "text", 0.7)
    assert(Dedup.liveVerifyBroadcasts == 0)
    assert((persistedIds -- before).size == 1)
    // repeated actions read the materialized blocks — no recompute against
    // the destroyed broadcast
    assert(df.count() == df.count() && df.count() >= 1)
  }
}
