package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic content-keyed sampling and split assignment for training
 * corpora. Random sampling (rand(), TABLESAMPLE) is non-reproducible across
 * runs and engines; hash-based bucketing on a content key is the standard
 * replacement — the same document always lands in the same bucket, on any
 * cluster size, in any engine. Keying on the content fingerprint (rather
 * than a surrogate id) keeps byte-identical duplicates in the SAME split, so
 * train/test contamination can't sneak in through re-crawled copies.
 *
 * Scale: splitBucket is a pure codegen'd projection (md5 + string slice +
 * conv) — no shuffle, no state; sampling composes with scan pushdown and
 * the bucket filter is evaluated row-local on every executor.
 *
 * Portability: md5 hex is identical everywhere; the bucket is the first 8
 * hex digits parsed base-16 (Spark `conv(h,16,10)`, DuckDB `('0x'||h)::BIGINT`)
 * mod `buckets` — so the DuckDB oracle reproduces the assignment exactly.
 */
object Sampling {

  /** Stable bucket in [0, buckets) from an arbitrary string key: first 8
    * md5 hex digits as an integer, mod buckets. 8 hex digits = 32 bits of
    * the digest — far below collision concern for BUCKETING (uniformity is
    * what matters, not injectivity). A NULL key buckets as the empty
    * string, so null-keyed rows get ONE deterministic bucket — they land
    * in a split and sample consistently instead of assignSplit defaulting
    * them while hashSample silently drops them. */
  def splitBucket(key: Column, buckets: Int = 10000): Column =
    conv(substring(md5(coalesce(key, lit(""))), 1, 8), 16, 10).cast("long") % buckets

  /** Named split from a bucket: train/val/test by cumulative per-10000
    * weights (trainPer10k=8000, valPer10k=1000 → 80/10/10). */
  def assignSplit(bucket: Column, trainPer10k: Int = 8000, valPer10k: Int = 1000): Column =
    when(bucket < trainPer10k, "train")
      .when(bucket < trainPer10k + valPer10k, "val")
      .otherwise("test")

  /** Deterministic ratePer10k/10000 sample: keep rows whose key-bucket
    * falls below the rate. Stable under re-runs and corpus growth (a doc's
    * membership never depends on other rows — unlike reservoir or sorted
    * top-N sampling, which reshuffle membership every run at 100 TB). */
  def hashSample(df: org.apache.spark.sql.DataFrame, key: Column, ratePer10k: Int)
    : org.apache.spark.sql.DataFrame =
    df.filter(splitBucket(key) < ratePer10k)

  /** EXACT stratified sample: ceil(fraction × |stratum|) rows per stratum,
    * chosen deterministically (rows ranked inside each stratum by the md5
    * of the key — a content-keyed total order, so reruns and engines agree
    * bit-for-bit). hashSample's membership is per-row-independent but only
    * APPROXIMATELY proportional per stratum; domain-balancing a training
    * mix needs the exact count, which costs one window shuffle on the
    * stratum key. Skew note for 100 TB: one stratum = one partition in the
    * rank window — a pathologically dominant source should be pre-split
    * (salt the stratum, sample per shard, union) or rebalanced upstream;
    * for source-count-bounded corpora the shuffle is even.
    *
    * ==Key uniqueness is the caller's contract== — the determinism claim
    * holds only when `key` is unique per row within a stratum: duplicate
    * keys tie in the md5 order and row_number breaks the tie by
    * post-shuffle arrival, so WHICH duplicate crosses the cutoff can
    * differ between runs/engines. Salt the key with a unique id (q73
    * concatenates text+doc_id) when duplicates are possible. Output =
    * input columns; the `_rank`/`_n` helpers are dropped. */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, stratum: Column,
                       key: Column, fracPer10k: Int)
    : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(md5(coalesce(key, lit(""))))
    df.withColumn("_rank", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(stratum)))
      .filter(col("_rank") <= ceil(col("_n") * fracPer10k / 10000.0))
      .drop("_rank", "_n")
  }
}
