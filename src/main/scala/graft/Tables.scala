package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Testdata table access + shared numeric helpers used across the query
  * registry. */
object Tables {

  /** Driver-provided tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): Spark reads it as LongType only
    // under spark.sql.legacy.parquet.nanosAsLong (set in every session this
    // engine builds); convert ns→µs with integer division (a double divide
    // would lose precision: epoch-ns exceeds 2^53).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /**
   * Order-insensitive exact double sum: accumulate in DECIMAL, emit DOUBLE.
   *
   * Plain SUM(double) is run-order dependent (IEEE addition is not
   * associative), so a Spark result and a DuckDB oracle can disagree in the
   * last bits and fail a hash compare even when both are "right". Summing
   * an exact DECIMAL(18,6) image of each value makes the aggregate exact
   * and engine-independent; the final cast back to DOUBLE is deterministic.
   * The reference leaned on an abs-tolerance compare instead
   * (ACCEPTABLE_DIFFERENCE, tests/.../TPCHSuite.yaml:11) — a hash gate
   * needs bit-equality, hence this.
   */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** Exact average built from the decimal sum (deterministic; same formula
    * is emitted in the oracle SQL). */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 6))).cast(DoubleType) / count(c)).cast(DoubleType)

  /** Oracle-SQL spellings of the above. */
  def dsumSql(expr: String): String = s"CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"
  def davgSql(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE) / COUNT($expr) AS DOUBLE)"
}
