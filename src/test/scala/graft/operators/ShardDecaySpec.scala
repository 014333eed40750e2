package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Rendezvous sharding, sorted-neighborhood linkage, and decayed sums:
  * the property each operator exists for, pinned on small inputs. */
class ShardDecaySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("rendezvous reshard 8->9 moves only keys won by the NEW shard") {
    val keys = spark.range(2000).toDF("k")
    val out = keys.select(col("k"),
        Sampling.rendezvousShard(col("k"), 8).as("s8"),
        Sampling.rendezvousShard(col("k"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // every moved key moved TO shard 8 (the new one) — HRW's defining
    // property: existing shards' weights are unchanged, so the old
    // argmax only loses to the newcomer
    out.filter(t => t._2 != t._3).foreach(t => assert(t._3 == 8, t.toString))
    val movedFrac = out.count(t => t._2 != t._3).toDouble / out.length
    assert(movedFrac > 0.05 && movedFrac < 0.20, s"moved $movedFrac, expected ~1/9")
    // a mod map would move almost everything
    val modMoved = out.count(t => t._1 % 8 != t._1 % 9).toDouble / out.length
    assert(modMoved > 0.8, s"mod-map moved $modMoved")
  }

  test("sorted-neighborhood pairs equal the naive rank-window self-join") {
    val recs = graft.Tables.load(spark, TestSpark.sfDir, "part")
      .select(col("p_partkey").as("id"), col("p_name").as("nm"))
    val got = Linkage.sortedNeighborhood(recs, "id", "nm", window = 5, maxDist = 4)
      .select("id_a", "id_b", "dist")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("nm"), col("id"))
    val ranked = recs.withColumn("rnk", row_number().over(w))
    val want = ranked.as("a").join(ranked.as("b"),
        col("b.rnk") > col("a.rnk") && col("b.rnk") - col("a.rnk") < 5)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.nm"), col("b.nm")).as("dist"))
      .filter(col("dist") <= 4)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("decayedSum halves a value's weight per elapsed half-life, exactly") {
    val ev = Seq(
      (1L, "2024-01-09 00:00:00", 8.0), // 0 steps (ref day)
      (1L, "2024-01-07 00:00:00", 8.0), // 2 days = 1 step -> 4.0
      (1L, "2024-01-05 00:00:00", 8.0), // 4 days = 2 steps -> 2.0
      (2L, "2024-01-08 00:00:00", 6.0)) // 1 day = 0 steps (floor div)
      .toDF("user_id", "tss", "value")
      .withColumn("ts", col("tss").cast("timestamp"))
    val out = Temporal.decayedSum(ev, col("user_id"), col("ts"), col("value"), 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out(1L) == ((8.0 + 4.0 + 2.0, 3L)))
    assert(out(2L) == ((6.0, 1L)))
  }
}
