package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Record linkage / entity resolution by BLOCKING — the standard
 * published shape (Fellegi–Sunter matching with blocking keys;
 * Papadakis et al.'s blocking surveys): candidate pairs come from
 * equi-self-joins on cheap deterministic keys derived from the record,
 * and the expensive pairwise scorer (edit distance here) runs on
 * candidates only. All-pairs comparison is structurally impossible in
 * this operator — there is no join without a blocking key.
 *
 * Scale shape: each blocking pass is one hash-shuffle on its key; a
 * pair surviving several passes is deduped BEFORE scoring (the distinct
 * is on ids, not scored rows). Recall is governed by the union of
 * blocking passes — the documented trade: a pair sharing NO blocking
 * key is never considered (that is what blocking means); add passes to
 * tighten recall. Block-size skew is the operational knob: a hot
 * blocking key degenerates toward quadratic, so keys should be chosen
 * selective (and a salted or capped variant layered if a corpus has
 * pathological blocks — same doctrine as operators.Skew).
 */
object Linkage {

  /** Candidate pairs from multi-pass blocking + exact edit-distance
    * scoring. `blockers` maps the name column to each pass's blocking
    * key (e.g. last token, first token, a phonetic code). Output:
    * (id_a, id_b, name_a, name_b, dist) with id_a < id_b, dist ≤
    * maxDist, one row per pair regardless of how many passes matched. */
  def blockedLinkage(recs: DataFrame, id: String, name: String,
                     blockers: Seq[Column => Column],
                     maxDist: Int): DataFrame = {
    require(blockers.nonEmpty, "need at least one blocking pass")
    require(maxDist >= 0, "maxDist must be >= 0")
    val base = recs.select(col(id).as("rid"), col(name).as("rname"))
    val blocked = blockers.zipWithIndex.map { case (bk, i) =>
      base.select(col("rid"), col("rname"),
        lit(i).as("blk"), bk(col("rname")).as("bkey"))
    }.reduce(_ union _)
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.bkey") === col("b.bkey") &&
          col("a.rid") < col("b.rid"))
      .select(col("a.rid").as("id_a"), col("b.rid").as("id_b"),
        col("a.rname").as("name_a"), col("b.rname").as("name_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo
    * 1995) — the OTHER classic blocking: sort all records by a derived
    * key and compare each record only against the next `window−1` in
    * that order. Complements [[blockedLinkage]]: typo'd blocking keys
    * that would miss an equi-block still land adjacent in sort order.
    *
    * Scale shape: the global rank comes from a distributed sort +
    * zipWithIndex (per-partition counts, then offsets — two jobs, no
    * single-partition window), and the neighbor pairs from a BINNED
    * equi-join on bucket = rank div window (each right row probes its
    * own and the previous bucket — q91's range-join trick), so
    * candidate volume is exactly n·(window−1) by construction. The
    * exact scorer runs on candidates only.
    *
    * `recs` must carry a long id and a string name. Output: one row per
    * in-window pair (id_a = the lower-RANK record), scored ≤ maxDist. */
  def sortedNeighborhood(recs: DataFrame, id: String, name: String,
                         window: Int, maxDist: Int): DataFrame = {
    require(window >= 2, "sorted-neighborhood needs window >= 2")
    require(maxDist >= 0, "maxDist must be >= 0")
    val spark = recs.sparkSession
    import spark.implicits._
    val sorted = recs.select(col(id).cast("long").as("rid"),
        col(name).as("rname"))
      .sort(col("rname"), col("rid"))
    val ranked = sorted.rdd.zipWithIndex
      .map { case (r, i) => (r.getLong(0), r.getString(1), i) }
      .toDF("rid", "rname", "rank")
    val a = ranked.select(col("rid").as("id_a"), col("rname").as("name_a"),
        col("rank").as("ra"))
      .withColumn("bkt", (col("ra") / window).cast("long"))
    val b = ranked.select(col("rid").as("id_b"), col("rname").as("name_b"),
        col("rank").as("rb"))
      .withColumn("bkt", explode(array(
        (col("rb") / window).cast("long"),
        (col("rb") / window).cast("long") - 1)))
    // a's bucket equals exactly one of b's two probes, so no pair
    // duplicates; the residual keeps only genuine in-window neighbors
    a.join(b, "bkt")
      .filter(col("rb") > col("ra") && col("rb") - col("ra") < window)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"), col("dist"))
  }
}
