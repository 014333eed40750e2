package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Keyed change application — the MERGE INTO / CDC-upsert primitive that
 * Spark core lacks without a table format underneath (Delta/Iceberg ship
 * it as a table operation; the reference engine has no write-side merge at
 * all — SURVEY §2.1 lists only CTAS-style output). A corpus pipeline needs
 * it the moment documents get re-crawled, re-scored, or retracted: apply
 * the day's changes to the canonical table without rebuilding it.
 *
 * Shape: one window compaction over the CHANGES (latest change per key by
 * a caller-supplied sequence column — changes are the small side, typically
 * ≪ base) and ONE full-outer equi join on the key. The base table is
 * shuffled once on the key it is naturally keyed by — with a bucketed base
 * table the Exchange disappears entirely (BucketedJoinSpec shape). No
 * driver-side state, no second pass.
 */
object Merge {

  /**
   * Apply `changes` to `base`, keyed by `key`:
   *  - the change with the greatest `seq` per key wins (earlier changes to
   *    the same key are superseded — `seq` must be unique per key, e.g. a
   *    log offset; ties would make the winner nondeterministic);
   *  - a winning `deleteOp` change removes the key;
   *  - any other op replaces (key present) or inserts (key absent) the
   *    payload columns;
   *  - base keys never mentioned in `changes` pass through untouched.
   *
   * `changes` must carry every base column plus `seq` and `op`. Output
   * schema = base schema.
   */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
                   seq: String, op: String,
                   deleteOp: String = "delete"): DataFrame = {
    val payload = base.columns.filterNot(_ == key)
    require(payload.forall(changes.columns.contains),
      s"changes must carry every base column; missing ${payload.filterNot(changes.columns.contains).mkString(",")}")
    val w = Window.partitionBy(col(key)).orderBy(col(seq).desc)
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(key), col(op).as("_op"),
        struct(payload.map(col): _*).as("_c"))
    val b = base.select(col(key), struct(payload.map(col): _*).as("_b"))
    val resolved: Seq[Column] = col(key) +: payload.map(p =>
      when(col("_op").isNotNull, col("_c").getField(p))
        .otherwise(col("_b").getField(p)).as(p))
    b.join(latest, Seq(key), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= deleteOp)
      .select(resolved: _*)
  }

  /**
   * Type-2 slowly-changing-dimension history: instead of applyChanges'
   * latest-wins snapshot, keep EVERY version of every key with its
   * validity interval — the form an audit/"as the corpus stood at seq s"
   * query needs (composes with Temporal.asOfJoin on valid_from).
   *
   * Event model: the base rows are the version at `baseSeq`; every change
   * (upsert or delete) at `seq` supersedes the key's previous version.
   * Upserts open a new version; deletes only CLOSE the previous one (a
   * tombstone emits no row of its own). `valid_to` = the superseding
   * event's seq, null while current; `is_current` = last event for the
   * key is a live upsert.
   *
   * Scale shape: ONE union (no join at all — full-outer merge logic is
   * subsumed by the per-key event order) and one lead() window over each
   * key's events — partition size = versions per key, bounded by change
   * frequency, never by corpus size. `seq` must be unique per key and
   * > `baseSeq` for changes, as in applyChanges.
   */
  def scd2History(base: DataFrame, changes: DataFrame, key: String,
                  seq: String, op: String, deleteOp: String = "delete",
                  baseSeq: Long = 0L): DataFrame = {
    val payload = base.columns.filterNot(_ == key)
    require(payload.forall(changes.columns.contains),
      s"changes must carry every base column; missing ${payload.filterNot(changes.columns.contains).mkString(",")}")
    val evs = base
      .select(col(key) +: payload.map(col) :+
        lit(baseSeq).cast("long").as("_seq") :+ lit(false).as("_del"): _*)
      .unionByName(changes
        .select(col(key) +: payload.map(col) :+
          col(seq).cast("long").as("_seq") :+
          (col(op) === deleteOp).as("_del"): _*))
    val w = Window.partitionBy(col(key)).orderBy(col("_seq"))
    evs
      .withColumn("_to", lead(col("_seq"), 1).over(w))
      .filter(!col("_del"))
      .select(col(key) +: payload.map(col) :+
        col("_seq").as("valid_from") :+ col("_to").as("valid_to") :+
        col("_to").isNull.as("is_current"): _*)
  }

  /**
   * Snapshot DIFF — the inverse of applyChanges: derive the change set
   * between two corpus versions. Each side is first projected to
   * (key, md5-of-payload) — the diff join ships 16-byte fingerprints,
   * never document bodies, which is what makes "diff two 100 TB
   * snapshots" a narrow-column full-outer join instead of a
   * payload-wide one. Output: (key, status) for every key whose state
   * changed — `added` (new only), `removed` (old only), `changed`
   * (both, different fingerprint); unchanged keys are dropped. md5 over
   * a separator-joined payload (U+0001 between columns keeps
   * ("ab","c") and ("a","bc") distinct) is the portable fingerprint
   * doctrine (TextAnalysis hashes); the oracle compares payloads
   * directly — same answer.
   */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
                   payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "diff needs at least one payload column")
    def fp(df: DataFrame, side: String) = df.select(col(key),
      // each column null-coalesced to a sentinel BEFORE joining:
      // concat_ws skips NULLs, which would collide (x="a", y=NULL) with
      // (x=NULL, y="a") into the same fingerprint
      md5(concat_ws("\u0001", payload.map(c =>
        coalesce(col(c).cast("string"), lit("\u0002NULL\u0002"))): _*))
        .as(side))
    fp(oldDf, "_old").join(fp(newDf, "_new"), Seq(key), "full_outer")
      .withColumn("status",
        when(col("_old").isNull, "added")
          .when(col("_new").isNull, "removed")
          .when(col("_old") =!= col("_new"), "changed"))
      .filter(col("status").isNotNull)
      .select(col(key), col("status"))
  }
}
