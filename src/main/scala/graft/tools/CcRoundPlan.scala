package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dumps the formatted physical plan of ONE connected-components round
  * (smallStar ∘ largeStar over a checkpointed edge set) — the iterative
  * plan that q66b's end-of-query explain hides behind per-round
  * localCheckpoint barriers. Builder observability for the r17 CC round
  * restructure; not a query path.
  *
  * Usage: CcRoundPlan SF_DIR OUT_DIR SUFFIX — writes
  * OUT_DIR/cc_round_SUFFIX.txt from the q44 pair graph of SF_DIR.
  */
object CcRoundPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val pairs = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 0.7)
    val edges = graft.operators.Dedup.ccCanon(
      pairs.select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v")))
      .localCheckpoint()
    val round = graft.operators.Dedup.ccSmallStar(graft.operators.Dedup.ccLargeStar(edges))
    val plan = round.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    Files.write(Paths.get(outDir, s"cc_round_$suffix.txt"), plan.getBytes("UTF-8"))
    println(s"[cc-round-plan] wrote cc_round_$suffix.txt (" +
      plan.linesIterator.count(_.contains("Exchange")) + " Exchange lines)")
    spark.stop()
  }
}
