package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * graft_top_bigram_count (row-local kernel) vs the distributed
  * explode → groupBy(doc,bigram) → max(doc) formulation it replaces:
  * identical counts on the corpus and on crafted repetition shapes.
  */
class TopBigramSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def aggregateForm(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.select(col("doc_id"), explode(TextAnalysis.wordBigrams(split(col("text"), " "))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap

  private def kernelForm(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.select(col("doc_id"),
        call_function("graft_top_bigram_count", split(col("text"), " ")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("matches the aggregate form on the test corpus") {
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
    val agg = aggregateForm(docs)
    val ker = kernelForm(docs)
    // aggregate form has no row for <2-token docs; kernel reports 0 there
    assert(agg.nonEmpty && agg.forall { case (id, c) => ker(id) == c })
    assert(ker.filterNot(kv => agg.contains(kv._1)).values.forall(_ == 0))
  }

  test("crafted shapes: runs, alternations, single token") {
    val docs = Seq(
      (1L, "a a a a a"),        // "a a" ×4
      (2L, "x y x y x y"),      // "x y" ×3 beats "y x" ×2
      (3L, "p q r s"),          // all bigrams unique
      (4L, "solo")              // no bigrams
    ).toDF("doc_id", "text")
    assert(kernelForm(docs) == Map(1L -> 4, 2L -> 3, 3L -> 1, 4L -> 0))
  }
}
