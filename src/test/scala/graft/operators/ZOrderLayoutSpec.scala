package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Z-order write clustering, pinned by runtime scan metrics: after
  * zOrderWrite on (x, y), a selective predicate on EITHER column must let
  * parquet row-group min/max pruning drop most rows at the scan — the
  * multi-dimensional counterpart of ScanPruningSpec's single-column sort.
  * A linear x-sort is the control: it prunes x-predicates but reads the
  * whole table for y-predicates.
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect { case s: FileSourceScanExec => s } match {
      case Seq() => plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        .flatMap(_.collect { case s: FileSourceScanExec => s })
      case s => s
    }
    scans.map(_.metrics("numOutputRows").value).sum
  }

  // 256x256 grid, one row per cell: selective box predicates on either axis
  private val n = 65536L
  private lazy val grid = spark.range(n)
    .select((col("id") % 256).as("x"), (col("id") / 256).as("y"))

  private val blockOpt = Map("parquet.block.size" -> (64 * 1024).toString)

  test("z-ordered layout prunes row groups on BOTH dimensions") {
    val dir = Files.createTempDirectory("graft_zorder").toFile.getAbsolutePath + "/t"
    Layout.zOrderWrite(grid, Seq("x", "y"), dir, bits = 8, numFiles = 2, options = blockOpt)

    val t = spark.read.parquet(dir)
    // data intact: clustering must not change content
    assert(t.count() == n)
    assert(t.agg(sum("x"), sum("y")).collect()(0) ==
      grid.agg(sum("x"), sum("y")).collect()(0))

    val onX = scanOutputRows(t.filter(col("x") < 16))
    val onY = scanOutputRows(t.filter(col("y") < 16))
    // 16/256 of the domain ≈ 4096 rows; allow generous row-group slack
    assert(onX < n / 4, s"x-predicate read $onX of $n rows — no pruning")
    assert(onY < n / 4, s"y-predicate read $onY of $n rows — no pruning")
  }

  test("control: linear x-sort cannot prune the y dimension") {
    val dir = Files.createTempDirectory("graft_xsort").toFile.getAbsolutePath + "/t"
    grid.repartitionByRange(2, col("x")).sortWithinPartitions("x")
      .write.options(blockOpt).parquet(dir)
    val t = spark.read.parquet(dir)
    assert(scanOutputRows(t.filter(col("x") < 16)) < n / 4)
    assert(scanOutputRows(t.filter(col("y") < 16)) > n / 2,
      "y is uniform within every x-run — row-group stats cannot skip")
  }

  test("full-int64-span keys: no error, z-values stay monotone (documented degrade)") {
    // span Long.Min..Long.Max exceeds double's 2^53 mantissa: the rank
    // quietly coarsens (nearby keys may collapse) but the conversion is
    // monotone, so layout is never WRONG — pinned here so the documented
    // contract in Layout.withZValue stays true
    val extremes = Seq(Long.MinValue, -1L << 40, -1L, 0L, 1L, 1L << 40, Long.MaxValue)
    val z = Layout.withZValue(extremes.toDF("k"), Seq("k"), bits = 12)
      .orderBy("k").select("_zv").collect().map(_.getLong(0)).toSeq
    assert(z == z.sorted, s"z-values not monotone in key order: $z")
    assert(z.head == 0L && z.last == (1L << 12) - 1, s"endpoints must span the rank range: $z")
    // adjacent small keys collapse onto one rank at this span — that IS
    // the documented degradation (resolution, not correctness)
    assert(z(2) == z(3) && z(3) == z(4))
  }

  test("interleaveBits places each column's bits at its own positions") {
    val out = Seq((3L, 0L), (0L, 3L), (1L, 1L)).toDF("a", "b")
      .select(Layout.interleaveBits(Seq(col("a"), col("b")), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a occupies bits {0,2}, b occupies bits {1,3}
    assert(out == Seq(1L + 4L, 2L + 8L, 1L + 2L))
  }
}
