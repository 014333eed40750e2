package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * graft_minhash_sig (one-pass 16-min kernel) must be value-identical to
  * the composable array_min(transform(...)) formulation it replaces — on
  * the real corpus, on unicode/degenerate strings, and in plan shape
  * (evaluated once per row, not once per extracted element).
  */
class MinHashSigSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def cols = "sid" +: "gn" +: TextHashing.MinHashParams.indices.map(j => s"m$j")

  private def both(df: org.apache.spark.sql.DataFrame) = {
    val sets = Dedup.gramSets(df, "doc_id", "text")
    val a = Dedup.signaturesFromSets(sets).select(cols.map(col): _*)
      .orderBy("sid").collect().toSeq
    val b = Dedup.signaturesFromSetsComposable(sets).select(cols.map(col): _*)
      .orderBy("sid").collect().toSeq
    (a, b)
  }

  test("matches the composable form on the test corpus") {
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
    val (a, b) = both(docs)
    assert(a.nonEmpty && a == b)
  }

  test("matches on degenerate and non-ascii inputs") {
    val weird = Seq(
      (1L, ""), (2L, "a"), (3L, "ab"), (4L, "abc"),
      (5L, "répétition déjà vu ü"), (6L, "日本語のテキスト断片"),
      (7L, "aaaaaaaaaa"), (8L, " \t mixed \n ws ")
    ).toDF("doc_id", "text")
    val (a, b) = both(weird)
    assert(a.size == 8 && a == b)
  }

  test("kernel is evaluated once per row (projection barrier holds)") {
    // file-backed scan: a LocalRelation would be constant-folded away,
    // taking the expression (and this assertion's subject) with it
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
    val plan = Dedup.signaturesFromSets(Dedup.gramSets(docs, "doc_id", "text"))
      .queryExecution.executedPlan.toString
    val evals = "graft_minhash_sig".r.findAllIn(plan).size
    assert(evals == 1, s"expected one kernel eval in the plan, got $evals:\n${plan.take(2000)}")
  }

  test("scaled 30-hash kernel matches its composable form; j < 16 equals the default profile") {
    import TextHashing.LshBanding
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
    val sets = Dedup.gramSets(docs, "doc_id", "text")
    val scaledCols = "sid" +: (0 until LshBanding.Scaled.numHashes).map(j => s"m$j")
    val a = Dedup.signaturesFromSets(sets, LshBanding.Scaled)
      .select(scaledCols.map(col): _*).orderBy("sid").collect().toSeq
    val b = Dedup.signaturesFromSetsComposable(sets, LshBanding.Scaled)
      .select(scaledCols.map(col): _*).orderBy("sid").collect().toSeq
    assert(a.nonEmpty && a == b)
    // profile compatibility: the first 16 hashes are the default profile
    val defSig = Dedup.signaturesFromSets(sets)
      .select(cols.map(col): _*).orderBy("sid").collect().toSeq
    val prefix = Dedup.signaturesFromSets(sets, LshBanding.Scaled)
      .select(cols.map(col): _*).orderBy("sid").collect().toSeq
    assert(prefix == defSig)
  }

  test("empty gram set yields null signature (array_min semantics)") {
    val empty = spark.sql(
      "SELECT graft_minhash_sig(CAST(array() AS ARRAY<BIGINT>)) AS s").collect()(0)
    assert(empty.isNullAt(0))
  }
}
