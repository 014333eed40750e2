package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Dedup.nearDupPairsAuto — the r14-verdict front door: the probe that
  * q202 oracle-gates is what the default entry point ACTS on. For each
  * of the three measured regimes, dispatch must equal the manual call
  * the recommendation names, row for row (same generators as
  * RecommendProfileSpec, which pins the recommendations themselves).
  */
class AutoDispatchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import DedupSpecCorpora.{docs, saturatedDoc, organicDoc, cjkDoc}

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("saturated corpus: auto == manual minHashLshPairsTokens (Scaled, rec cap)") {
    val d = docs(saturatedDoc, 600)
    val auto = Dedup.nearDupPairsAuto(d, "doc_id", "text", 0.7, sampleDocs = 512)
    val rec = Dedup.lastRecommendation.get
    assert(rec.profile === "token")
    val manual = Dedup.minHashLshPairsTokens(d, "doc_id", "text", 0.7,
      k = 3, banding = TextHashing.LshBanding.Scaled, maxBucket = rec.maxBucket)
    assert(rows(auto) === rows(manual))
  }

  test("organic corpus: auto == manual Scaled char pipeline (rec cap 0)") {
    val d = docs(organicDoc, 600)
    val auto = Dedup.nearDupPairsAuto(d, "doc_id", "text", 0.7, sampleDocs = 512)
    val rec = Dedup.lastRecommendation.get
    assert(rec.profile === "char" && rec.maxBucket === 0L)
    val manual = Dedup.minHashLshPairsScaled(d, "doc_id", "text", 0.7)
    assert(rows(auto) === rows(manual))
  }

  test("CJK corpus: auto == manual minHashLshPairsCp (rec cap)") {
    val d = docs(cjkDoc, 300)
    val auto = Dedup.nearDupPairsAuto(d, "doc_id", "text", 0.7, sampleDocs = 256)
    val rec = Dedup.lastRecommendation.get
    assert(rec.profile === "codepoint")
    val manual = Dedup.minHashLshPairsCp(d, "doc_id", "text", 0.7,
      maxBucket = rec.maxBucket)
    assert(rows(auto) === rows(manual))
  }

  test("dup storm through auto: cap recommended AND applied (completes under a tight budget)") {
    // 400 copies of 4 distinct texts — uncapped banding would generate
    // ~6×C(100,2)×4 candidates; the recommended cap of 500 keeps every
    // bucket visited and the pipeline completes under a budget that the
    // uncapped run would trip. (The storm is exact dups, so the probe's
    // SAMPLE already concentrates: estPairsPerDoc > 16 ⇒ cap.)
    val storm = docs(i => saturatedDoc(i % 4), 400)
    spark.conf.set("graft.dedup.candidatePairBudget", "200000")
    try {
      val auto = Dedup.nearDupPairsAuto(storm, "doc_id", "text", 0.9,
        sampleDocs = 256)
      val rec = Dedup.lastRecommendation.get
      assert(rec.maxBucket === 500L, s"storm must recommend the cap (got $rec)")
      assert(auto.count() > 0L, "exact-dup pairs must survive the cap")
    } finally spark.conf.unset("graft.dedup.candidatePairBudget")
  }

  test("canonicalizeAuto == clusters-over-auto-pairs keep-min (the q204 shape)") {
    // 8-copy families (400 docs, 50 distinct texts): the probe still
    // picks token/uncapped (saturated universe, est under the 16/doc cap
    // trigger) and the dispatched chain must collapse each family to its
    // min id
    val d = docs(i => saturatedDoc(i % 50), 400)
    val auto = Dedup.canonicalizeAuto(d, "doc_id", "text", 0.7)
    val pairs = Dedup.nearDupPairsAuto(d, "doc_id", "text", 0.7)
    val clusters = Dedup.connectedComponents(pairs)
      .withColumnRenamed("doc_id", "_cid")
    val manual = d.join(clusters, d("doc_id") === org.apache.spark.sql.functions.col("_cid"), "left")
      .filter(org.apache.spark.sql.functions.col("rep_id").isNull ||
        org.apache.spark.sql.functions.col("rep_id") === d("doc_id"))
      .drop("_cid", "rep_id")
    val a = auto.select("doc_id").collect().map(_.getLong(0)).toSet
    val m = manual.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === m)
    assert(a.size < 400, "the saturated corpus has near-dups to drop")
  }

  test("guard observability: lastGuardStats carries the histogram summary") {
    val d = docs(organicDoc, 200)
    val mp = Dedup.minHashLshPairsManaged(d, "doc_id", "text", 0.7)
    try {
      val (est, maxB, nB) = Dedup.lastGuardStats
      assert(est >= 0L && nB > 0L && maxB >= 1L,
        s"guard ran, stats must be real: ($est, $maxB, $nB)")
      assert(mp.guardEstPairs === est,
        "ManagedPairs surfaces the same estimate the guard enforced")
    } finally mp.close()
  }

  test("incremental probe-side guard (opt-in): hot index buckets trip before the probe join") {
    // index = a saturated 300-doc corpus (3 hot texts → bucket 100 per
    // band per text); batch = 50 docs of the SAME texts (fresh ids), so
    // every band collides: probe est = 4 bands × 100 × (17+17+16) =
    // 20,000 > the 10,000 budget, while the WITHIN-batch volume
    // (4 × ΣC(~17,2) ≈ 1.6k) passes — only the probe-side estimate can
    // catch this shape, and only when bandSizes is given.
    val corpus = docs(i => saturatedDoc(0) + " x" + (i % 3), 300)
    val batch = docs(i => saturatedDoc(0) + " x" + (i % 3), 50)
      .select((org.apache.spark.sql.functions.col("doc_id") + 10000L).as("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val base = Dedup.dedupIndex(corpus, "doc_id", "text")
    spark.conf.set("graft.dedup.candidatePairBudget", "10000")
    try {
      val guarded = base.copy(bandSizes = Some(Dedup.indexBandSizes(base.bands)))
      val e = intercept[IllegalStateException] {
        Dedup.incrementalPairs(guarded, batch, "doc_id", "text", 0.7).count()
      }
      assert(e.getMessage.contains("incremental probe pre-flight"))
      assert(e.getMessage.contains("graft.dedup.candidatePairBudget"))
      // without bandSizes the probe-side guard is off (documented opt-in:
      // computing the histogram per batch would re-scan the index) and
      // the within-batch guard alone passes this healthy batch
      assert(Dedup.incrementalPairs(base, batch, "doc_id", "text", 0.7)
        .count() >= 0L)
    } finally spark.conf.unset("graft.dedup.candidatePairBudget")
  }

  test("incremental within-batch guard message names only this site's knobs") {
    val idx = Dedup.dedupIndex(docs(organicDoc, 50), "doc_id", "text")
    val hotBatch = docs(i => saturatedDoc(0) + " z" + (i % 3), 300)
    spark.conf.set("graft.dedup.candidatePairBudget", "1000")
    try {
      val e = intercept[IllegalStateException] {
        Dedup.incrementalPairs(idx, hotBatch, "doc_id", "text", 0.7).count()
      }
      assert(e.getMessage.contains("graft.dedup.candidatePairBudget"))
      assert(!e.getMessage.contains("minHashLshPairsTokens"),
        "incremental site must not advertise hatches it doesn't have (r14 advisor)")
      assert(!e.getMessage.contains("maxBucket"),
        "incremental site has no bucket-cap knob")
    } finally spark.conf.unset("graft.dedup.candidatePairBudget")
  }
}
