package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables.r6
import graft.operators.{Decontamination, SimilaritySearch}

/**
 * Streaming curation built on STREAM-STATIC joins: an ingest stream of
 * documents checked against a static, pre-computed reference relation —
 * the shape a production pipeline runs while a crawl lands (the batch
 * operators in graft.operators re-run the same Column expressions; see
 * EventStreamsSpec's row-local kernel parity for the stateless ones —
 * this module covers the one curation shape that genuinely needs a JOIN
 * in-stream).
 *
 * Semantics mirror the batch Decontamination.contaminationReport's
 * detection set exactly: a doc is contaminated iff it shares ≥1 token
 * n-gram fingerprint with the eval set. Only the OUTPUT differs — the
 * stream emits the contaminated ids as they arrive (no per-doc overlap
 * counts: counting needs a stateful aggregation; membership needs only
 * the stream-static left-semi join plus per-doc dedup, both supported in
 * append mode). StreamDecontaminationSpec pins the parity.
 */
object CurationStreams {

  /** Distinct n-gram fingerprints of a static eval set — compute once,
    * reuse across micro-batches (the static side of the join; Spark
    * re-plans it per batch, so persist() it for long streams). */
  def evalGramSet(evalSet: DataFrame, text: String, n: Int): DataFrame =
    evalSet.select(explode(
      Decontamination.tokenGramFingerprints(col(text), n)).as("g")).distinct()

  /** Contaminated doc ids from a STREAMING doc source: explode each
    * incoming doc's gram fingerprints (row-local projection), left-semi
    * join the static eval grams (stream-static, supported in append
    * mode), dedup to one row per contaminated doc. dropDuplicates keeps
    * per-id state; bound it with a watermark on an event-time column
    * upstream for unbounded streams (the id set itself is small — it's
    * the leaked tail). */
  def contaminatedIds(docs: DataFrame, evalGrams: DataFrame,
                      id: String, text: String, n: Int = 8): DataFrame =
    docs
      .select(col(id), explode(
        Decontamination.tokenGramFingerprints(col(text), n)).as("g"))
      .join(evalGrams, Seq("g"), "left_semi")
      .dropDuplicates(id)

  /** Ids of STREAMING vectors that semantically duplicate a member of a
    * static, pre-clustered corpus — the incremental form of
    * [[graft.operators.SimilaritySearch.semanticDedup]] for an index
    * that's already built (a training corpus checked as new crawl data
    * lands, no corpus re-scan). Each incoming vector is assigned to its
    * nearest static centroid (row-local fold over a one-row broadcast —
    * nothing stateful), then compared against that ONE cluster's members
    * via a stream-static equi join on cid; candidates are bounded by
    * cluster size exactly as in the batch operator. `index` is
    * kmeansAssign's output on the corpus, `cents` is kmeansCentroids
    * with the SAME (bits, iters) — persist both for long streams.
    * Append-mode safe: the only state is dropDuplicates' per-id set
    * (watermark upstream for unbounded streams). */
  def semanticDupIds(stream: DataFrame, index: DataFrame, cents: DataFrame,
                     threshold: Double): DataFrame =
    SimilaritySearch.assignToCentroids(stream, cents)
      .join(index.select(col("cid"), col("embedding").as("iv")), Seq("cid"))
      .filter(r6(SimilaritySearch.cosine(col("embedding"), col("iv")))
        >= threshold)
      .dropDuplicates("vec_id")
      .select(col("vec_id"), col("cid"))
}
