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
}
