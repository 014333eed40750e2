package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Resolution semantics of the CDC merge: latest-seq wins, deletes drop,
  * inserts land, absent-key deletes are no-ops, untouched keys pass. */
class MergeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("applyChanges: upsert conflict, delete, phantom delete, insert, passthrough") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "b2", "upsert", 1),  // superseded
      (2L, "b3", "upsert", 2),  // wins
      (3L, null, "delete", 1),  // removes key 3
      (9L, null, "delete", 1),  // key never existed — must not emit a row
      (4L, "d", "upsert", 1)    // insert
    ).toDF("k", "v", "op", "seq")
    val got = Merge.applyChanges(base, changes, "k", "seq", "op")
    assert(got.columns.toSeq === Seq("k", "v")) // output schema = base schema
    assert(got.orderBy("k").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b3"), (4L, "d")))
  }

  test("applyChanges: empty change set is the identity") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq.empty[(Long, String, String, Int)].toDF("k", "v", "op", "seq")
    assert(Merge.applyChanges(base, changes, "k", "seq", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b")))
  }

  test("applyChanges over a bucketed base: the base side joins with NO Exchange") {
    // The 100 TB deploy shape: the canonical table is written bucketed by
    // its key, so the daily merge shuffles ONLY the (small) change log —
    // the base table's scan layout IS the join layout (BucketedJoinSpec's
    // contract applied to the merge operator).
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_bucket")
      .toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS merge_base_b")
    spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"doc_id", $"text").coalesce(1)
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$dir/merge_base_b").saveAsTable("merge_base_b")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val base = spark.table("merge_base_b")
      val changes = base.filter($"doc_id" % 500 === 0)
        .select($"doc_id", org.apache.spark.sql.functions.concat($"text",
          org.apache.spark.sql.functions.lit(" v1")).as("text"),
          org.apache.spark.sql.functions.lit("upsert").as("op"),
          org.apache.spark.sql.functions.lit(1).as("seq"))
      val merged = Merge.applyChanges(base, changes, "doc_id", "seq", "op")
      assert(merged.count() > 0)
      val p = merged.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") && p.contains("FullOuter"), p.take(3000))
      assert(p.contains("Bucketed: true"), p.take(3000))
      // ONE Exchange total: the change-log side's hash shuffle (its window
      // compaction partitioning on the key is reused by the join). The
      // base side — the side whose volume scales with the corpus — reads
      // straight from the bucketed layout into the merge join.
      assert("Exchange".r.findAllIn(p).size <= 1,
        s"bucketed merge base still shuffles:\n${p.take(3000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS merge_base_b")
    }
  }

  test("containmentPairs: substring doc fully contained, reverse direction absent") {
    val host = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, host),
      (2L, host.substring(10, 40)), // verbatim excerpt → containment 1.0 in 1
      (3L, "completely unrelated text with different characters")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 0.9)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.exists { case (a, b, c) => a == 2L && b == 1L && c == 1.0 })
    assert(!got.exists { case (a, b, _) => a == 1L && b == 2L }) // host ⊄ quote
  }
}
