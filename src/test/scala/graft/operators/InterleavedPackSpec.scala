package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** interleavedPack: patch placeholders flow through the proven chunk
  * arithmetic — boundary splits, patch counting, and the no-image
  * degeneration to plain emitChunks. */
class InterleavedPackSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("an image's patch run splits across a chunk boundary like text") {
    import spark.implicits._
    // budget 4: doc 1 (no image) = 3 tokens; doc 2 has 3 patches + 2
    // text tokens -> stream = [a b c | IMG IMG IMG d e] -> chunk 0 =
    // "a b c [IMG]" (1 patch), chunk 1 = "[IMG] [IMG] d e" (2 patches)
    val docs = Seq((1L, "s", "a b c"), (2L, "s", "d e"))
      .toDF("doc_id", "source", "text")
    val got = Multimodal.interleavedPack(docs, col("source"), col("doc_id"),
        col("text"), col("doc_id") === 2L, lit(3), 4)
      .orderBy(col("chunk")).collect()
    assert(got.length === 2)
    assert((got(0).getLong(3), got(0).getLong(4)) === ((4L, 1L))) // tokens, patches
    assert((got(1).getLong(3), got(1).getLong(4)) === ((4L, 2L)))
    assert(got(0).getLong(2) === 2L) // both docs touch chunk 0
  }

  test("without images the output equals emitChunks plus a zero patch column") {
    import spark.implicits._
    val docs = Seq((1L, "s", "t u v w"), (2L, "s", "x y"), (3L, "r", "z"))
      .toDF("doc_id", "source", "text")
    val plain = Packing.emitChunks(docs, col("source"), col("doc_id"),
        col("text"), 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val inter = Multimodal.interleavedPack(docs, col("source"), col("doc_id"),
        col("text"), lit(false), lit(5), 3)
      .collect()
    assert(inter.forall(_.getLong(4) === 0L))
    val asMap = inter.map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getString(5))).toMap
    assert(asMap === plain)
  }

  test("a doc that is ONLY an image (empty text token) still packs deterministically") {
    import spark.implicits._
    val docs = Seq((1L, "s", "")).toDF("doc_id", "source", "text")
    val got = Multimodal.interleavedPack(docs, col("source"), col("doc_id"),
        col("text"), lit(true), lit(2), 8).collect()
    // "[IMG] [IMG] " + "" -> tokens [IMG],[IMG],"" = 3 tokens, 2 patches
    assert(got.length === 1)
    assert(got(0).getLong(3) === 3L && got(0).getLong(4) === 2L)
  }
}
