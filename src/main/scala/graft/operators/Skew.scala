package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit key-salting — the MANUAL skew lever beside the engine's
 * automatic one (AQE skew-join splitting, asserted by SkewJoinSpec).
 * AQE only rescues sort-merge joins it can observe at a shuffle
 * boundary; a hot key inside a broadcast-probed aggregation, a window
 * partition, or a hash join it chose NOT to convert still lands on one
 * task. At 100 TB "one task" means one executor core owning 30% of the
 * corpus — salting splits that key across `salts` reducers by
 * construction, not by runtime luck.
 *
 * Both operators are ANSWER-preserving rewrites: the salt column is
 * derived, used for routing, and dropped — the oracle states the plain
 * (unsalted) form and the result must hash-match it. Salts are
 * DETERMINISTIC (hash of a caller-chosen column, not rand()): retries,
 * speculative tasks, and the correctness gate all see the same routing.
 *
 * The reference handles skew by hash-partitioning on the join/group key
 * and hoping (PartwiseJoin.cpp batches within a partition but a hot key
 * still serializes); salting is the standard published fix (e.g. the
 * "salted join" pattern in the Spark literature).
 */
object Skew {

  /** Inner equi-join with the big side salted and the small side
    * replicated `salts`× — the hot-key join fix. Each big row routes to
    * exactly one of `salts` sub-partitions of its key (deterministic:
    * `xxhash64(saltSource) mod salts`); the small side is exploded so
    * every (key, salt) bucket holds its one matching row. The join is a
    * plain equi-join on (key, salt): a key owning 30% of the big side
    * now occupies `salts` reducers instead of one.
    *
    * Cost: small side grows `salts`× (it is the SMALL side — bounded);
    * answer: identical to the unsalted join, because for any matching
    * (big, small) pair exactly one replica of the small row carries the
    * big row's salt. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 salts: Int, saltSource: Column): DataFrame = {
    require(salts >= 2, "salting needs >= 2 buckets")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt_r",
      explode(array((0 until salts).map(lit): _*)))
    salted
      .join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          col("__salt") === col("__salt_r"))
      .drop("__salt", "__salt_r")
  }

  /** `sum(value) OVER (PARTITION BY key)` without a Window operator —
    * the hot-partition window fix, and at scale strictly better even
    * without skew: the big side is NEVER shuffled. Partial sums per
    * (key, salt) — map-side combinable, ≤ |keys|·salts rows reach the
    * exchange — collapse to one total per key, and that tiny relation
    * broadcasts back onto the input. A WindowExec would shuffle the
    * whole corpus on `key` and sort each partition; a hot key would
    * serialize on one task.
    *
    * `value` must be integral (exact addition) — callers with doubles
    * go through Tables.dsum-style decimal images first, same doctrine.
    * Output: the input plus `totalName`.
    *
    * The re-attach broadcast is BYTE-GATED (the tokenRarity/q70 rule):
    * `totals` has one row per distinct key — bounded in the hot-few-keys
    * regime this operator targets, but a per-user sum with one whale key
    * has |users| rows, and an unconditional broadcast() hint would bypass
    * the engine's own sizing doctrine. The row estimate comes from a
    * single-pass HLL over the (already tiny, lineage-truncated) partial
    * relation — it steers the physical strategy only, never the answer;
    * over budget the join falls to SHUFFLE_HASH on the key (totals was
    * just shuffled on that key by its own aggregate anyway, and the
    * big side's shuffle is on the UNSALTED key — uniform only if keys
    * are many, which is exactly the over-budget regime). Both physical
    * plans share one oracle (q120/q120b). */
  def saltedPartitionSum(df: DataFrame, key: Column, value: Column,
                         salts: Int, saltSource: Column,
                         totalName: String,
                         broadcastBudgetBytes: Long = 64L * 1024 * 1024)
    : DataFrame = {
    require(salts >= 2, "salting needs >= 2 buckets")
    // lineage-truncated: partials feeds BOTH the sizing probe and totals;
    // without the truncation the big-side aggregate would execute twice
    val partials = Dedup.truncateLineage(df
      .groupBy(key.as("__k"),
        pmod(xxhash64(saltSource), lit(salts)).cast("int").as("__salt"))
      .agg(sum(value).as("__partial")))
    val totals = partials
      .groupBy(col("__k"))
      .agg(sum(col("__partial")).as(totalName))
    // key payload + 8-byte total + hash-relation overhead per entry —
    // the same bytes-not-rows rule as Dedup's verify map
    val nKeys = partials.agg(approx_count_distinct(col("__k")))
      .collect()(0).getLong(0)
    val sized =
      if (nKeys * 96L <= broadcastBudgetBytes) broadcast(totals)
      else totals.hint("SHUFFLE_HASH")
    // null-safe equality: a window PARTITION BY treats NULL as its own
    // partition, so the re-attach must too — plain === would silently
    // drop every null-key row from the output
    df.join(sized, key <=> col("__k")).drop("__k")
  }
}
