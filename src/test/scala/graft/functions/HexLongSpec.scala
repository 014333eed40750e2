package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** graft_hex_long kernel ≡ the per-digit polynomial (hexParsePolynomial),
  * including the documented truncation quirk (missing chars read as
  * ascii 0 → digit −48) and uppercase handling. */
class HexLongSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  import graft.operators.TextAnalysis

  private val windows = Seq((1, 12), (9, 8), (25, 8), (1, 15), (30, 8))

  test("kernel equals the polynomial on md5 hex of the corpus tokens") {
    val toks = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .select(md5(col("t")).as("hx"))
    for ((s, d) <- windows) {
      val diff = toks.select(
          TextAnalysis.hexParse(col("hx"), s, d).as("k"),
          TextAnalysis.hexParsePolynomial(col("hx"), s, d).as("p"))
        .filter(col("k") =!= col("p"))
      assert(diff.isEmpty, s"window ($s,$d) diverged")
    }
  }

  test("kernel equals the polynomial on short, empty, uppercase, odd inputs") {
    val edge = Seq("", "a", "AB", "deadBEEF", "0", "ffffffffffffffff",
      "xyz", "é9", "00000000000000000000000000000000").toDF("hx")
    for ((s, d) <- windows) {
      val rows = edge.select(col("hx"),
          TextAnalysis.hexParse(col("hx"), s, d).as("k"),
          TextAnalysis.hexParsePolynomial(col("hx"), s, d).as("p"))
        .collect()
      rows.foreach(r =>
        assert(r.getLong(1) == r.getLong(2), s"'${r.getString(0)}' window ($s,$d)"))
    }
  }

  test("null input yields null") {
    val r = Seq[Option[String]](None).toDF("hx")
      .select(TextAnalysis.hexParse(col("hx"), 1, 12)).collect()(0)
    assert(r.isNullAt(0))
  }
}
