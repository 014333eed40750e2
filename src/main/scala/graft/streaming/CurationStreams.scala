package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables.r6
import graft.operators.{Decontamination, Dedup, SimilaritySearch, TextAnalysis}

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

  /** Exact streaming dedup with WATERMARK-BOUNDED state: one surviving
    * row per content fingerprint, duplicates dropped across micro-batch
    * boundaries, via `dropDuplicatesWithinWatermark` — the primitive
    * whose per-key state EXPIRES once the watermark passes the key's
    * event time. Plain dropDuplicates holds every fingerprint ever seen
    * (state grows with the corpus — the thing that kills a long-running
    * 100 TB ingest); the watermark form holds only the fingerprints of
    * the trailing `delay` window, which is the right contract for crawl
    * ingest where byte-identical re-fetches cluster in time. Batch
    * parity is the exact-dedup keeper semantics (one row per
    * fingerprint) for any stream whose duplicates arrive within the
    * delay; re-fetches farther apart than the delay are the documented
    * trade for bounded state — catch them with the batch operator
    * (q42 shape) over the landed files. */
  def dedupedDocs(docs: DataFrame, ts: String, id: String, text: String,
                  delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.contentFingerprint(col(text)))
      .withWatermark(ts, delay)
      .dropDuplicatesWithinWatermark("fp")
      .select(col(id), col(ts), col("fp"))

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

  /** Near-duplicate pairs between a STREAMING doc source and a static
    * MinHash-LSH [[graft.operators.Dedup.DedupIndex]] — the streaming
    * form of the q81 incremental arrival path (check a landing crawl
    * against the corpus as it streams in, no corpus re-scan per batch).
    *
    * Same detection semantics as Dedup.incrementalPairs' PROBE side —
    * band-signature equi collision, size-ratio prefilter, exact-Jaccard
    * verify at the same threshold, identical inter/(na+nb−inter)
    * arithmetic — re-shaped for what append-mode streaming allows: the
    * batch verify's mapPartitions-over-pruned-sets needs per-batch
    * collects/persists, so the stream instead CARRIES each incoming
    * doc's gram set on its band rows (4× array duplication, bounded by
    * the batch) and verifies row-locally with array_intersect after the
    * two stream-static equi joins (bands, then the matched index doc's
    * gram set). Within-batch pairs are not emitted — that is a
    * stream-stream self-join; run the batch operator over the landed
    * files for intra-crawl dups (StreamNearDupSpec pins the probe-side
    * parity). Persist both index relations for long streams. */
  def nearDupPairs(stream: DataFrame, index: Dedup.DedupIndex, id: String,
                   text: String, threshold: Double): DataFrame = {
    // band rows carry the doc's gram set (stateless projection — joining
    // sets back post-explode would be a stream-stream self-join)
    val inBands = Dedup.bandRelationWithSets(Dedup.gramSets(stream, id, text))
    inBands.as("y")
      .join(index.bands.as("x"),
        col("x.sig") === col("y.sig") &&
          least(col("x.gn"), col("y.gn")).cast("double") >=
            lit(threshold) * greatest(col("x.gn"), col("y.gn")))
      .select(col("x.sid").as("id_a"), col("y.sid").as("id_b"), col("y.gs"))
      .dropDuplicates("id_a", "id_b")
      .join(index.sets.select(col("sid").as("id_a"), col("gs").as("xgs")),
        Seq("id_a"))
      .withColumn("inter", size(array_intersect(col("gs"), col("xgs"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("xgs")) + size(col("gs")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
