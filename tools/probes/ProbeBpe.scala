package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: pin the BPE rewrite primitives — char split and the
  * greedy leftmost non-overlapping merge via the aggregate HOF. */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineContext.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(("aaa", "a", "a"), ("abab", "a", "b"), ("xaby", "a", "b"),
      ("b", "a", "b")).toDF("w", "sa", "sb")
    df.select(col("w"), col("sa"), col("sb"), split(col("w"), "").as("syms"))
      .select(col("w"), col("syms"),
        expr("""aggregate(syms,
          named_struct('out', cast(array() as array<string>), 'just', false),
          (acc, s) -> IF(NOT acc.just AND size(acc.out) > 0
                         AND element_at(acc.out, -1) = sa AND s = sb,
            named_struct('out', concat(slice(acc.out, 1, size(acc.out)-1),
              array(concat(sa, sb))), 'just', true),
            named_struct('out', concat(acc.out, array(s)), 'just', false)),
          acc -> acc.out)""").as("merged"))
      .collect().foreach(r => println(
        s"${r.getString(0)} syms=${r.getSeq[String](1).mkString("|")}" +
          s" merged=${r.getSeq[String](2).mkString("|")}"))
    spark.stop()
  }
}
