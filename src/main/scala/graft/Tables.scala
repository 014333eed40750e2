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
    if (name == "events") normalizeTs(df, "ts") else df
  }

  /**
   * Normalize a parquet TIMESTAMP(NANOS) column to Spark's session-tz
   * TIMESTAMP (µs), whatever type this Spark version read it as. Used by
   * [[load]], Bench, Verify, and the streaming parity spec so every path
   * lands on one µs semantics:
   *
   *  - `LongType`  — read under `spark.sql.legacy.parquet.nanosAsLong`
   *    (older 3.x/4.0 behavior; the sessions still set the conf for
   *    portability). Convert ns→µs with INTEGER division — a double divide
   *    would lose precision, epoch-ns exceeds 2^53.
   *  - `TimestampNTZType` — the installed Spark 4.1.2 reads NANOS as NTZ
   *    (the legacy conf no longer yields LongType). Every session this
   *    engine builds pins `spark.sql.session.timeZone=UTC`, so the cast to
   *    TIMESTAMP is a pure reinterpretation: identical micros, and the
   *    watermark/window operators (which require TIMESTAMP, not NTZ)
   *    analyze cleanly.
   *  - `TimestampType` — already what we want; no-op.
   */
  def normalizeTs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast("timestamp"))
      case _ => df
    }
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

  /**
   * round(x, 6) with DuckDB's DOUBLE semantics: multiply by 10^6, round
   * to the nearest integer (half away from zero), divide back.
   *
   * Spark's `round(x, 6)` rounds the EXACT binary expansion of x via
   * BigDecimal, so the two engines can disagree by 1e-6 on the same
   * double when x sits at a representation midpoint: observed on q70 at
   * sf0.001, where mean_rarity's binary value read ...774999 under
   * BigDecimal but its ×10⁶ product crossed the .5 line, so DuckDB
   * said ...78 and Spark said ...77. In THIS form every step is
   * deterministic and identical cross-engine: the ×10⁶ product is one
   * exactly-rounded IEEE multiply, scale-0 rounding of a double is
   * unambiguous in both engines (half away from zero on the same binary
   * value), and the final divide is exactly rounded. Use this — not
   * round(_, 6) — for every double the oracle compares. drnd is the
   * same at any digit count (q58's percentiles round at 4).
   *
   * SIGNED ZERO: Spark's `round` routes through BigDecimal, which has no
   * negative zero, so drnd of a negative value that rounds to zero emits
   * +0.0 — but DuckDB's C-library round returns -0.0 there and the final
   * divide keeps it, so the driver's sign-sensitive hash diverges (the r9
   * q154 failure: one covariance cell of 2080, value-identical otherwise).
   * Doctrine: drnd itself never emits -0.0 (proven by RoundingDoctrineSpec
   * on the bit pattern), and every ORACLE expression whose rounded output
   * can be reached from below appends `+ 0.0` (IEEE -0.0 + 0.0 = +0.0;
   * identity on every other value, NULL-transparent). Oracles whose
   * rounded outputs are nonnegative by construction (counts, fractions,
   * norms, abs-sums, prices, surprisal bits, distances) need no
   * normalization; the negative-capable set — cosines (q47/q48/q48b/q86/
   * q117/q135), kappa (q153), covariance (q154), sin/cos (q23), centroid
   * cosine (q156), OLS slope (q157) — carries the suffix. Audited clean
   * r10: q136 drift (sum of abs), q149 tf-idf cosine (all weights > 0
   * since df ≤ N, plus a ≥0.9 gate), q152 winsorize (n_chars ≥ 0) are
   * nonnegative by construction. The exact-DECIMAL paths (dsum/davg) are
   * immune: decimal
   * zero has no sign, so the cast back to DOUBLE is always +0.0. */
  def r6(c: Column): Column = drnd(c, 6)
  def drnd(c: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    round(c * p) / p
  }
}
