package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.TextHashing

/** Dev scratch: pin the cross-engine CJK fixture construction — token →
  * codepoint 0x4E00+（tokenHash mod 20000) → 3-byte UTF-8 via unhex. */
object ProbeCjk {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineContext.session()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 3)
    val out = docs.select(col("doc_id"),
      array_join(transform(split(col("text"), " "), t => {
        val cp = lit(19968L) + TextHashing.tokenHash(t) % lit(20000L)
        val b = (lit(224L) + shiftright(cp, 12)) * lit(65536L) +
          (lit(128L) + shiftright(cp, 6) % lit(64L)) * lit(256L) +
          (lit(128L) + cp % lit(64L))
        decode(unhex(conv(b, 10, 16)), "UTF-8")
      }), "").as("cjk"))
      .orderBy(col("doc_id"))
    out.select(col("doc_id"), md5(col("cjk")).as("m"), length(col("cjk")).as("n"))
      .collect().foreach(r => println(s"${r.getLong(0)}\t${r.getString(1)}\t${r.getInt(2)}"))
    spark.stop()
  }
}
