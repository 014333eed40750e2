package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Write-path data layout for scan pruning at scale: Z-ORDER clustering.
 *
 * Parquet/ORC skip-data (row-group min/max pruning — see ScanPruningSpec)
 * only fires when rows with similar key values are physically adjacent. A
 * linear sort gives that for ONE column; multi-dimensional predicates need
 * a space-filling curve. zOrderWrite interleaves the bits of each cluster
 * column's normalized rank (Morton/Z-value), range-partitions on the
 * Z-value, sorts within partitions, and writes — after which selective
 * predicates on ANY clustered column prune most row groups
 * (ZOrderLayoutSpec pins it by scan metrics).
 *
 * Scale shape: one min/max aggregate over the cluster columns (a 1-row
 * driver fetch, same budget class as Dedup's sizing aggregate), then a
 * pure projection + one range shuffle + local sort — the standard
 * write-amplification cost of clustering, linear in data size, no
 * driver-side data. The reference engine has no write-path clustering
 * (results stay in GPU frames; persistence is client-side): this operator
 * serves the engine's own skip-data machinery, reference
 * engine/src/skip_data/SkipDataProcessor.cpp being the read half.
 */
object Layout {

  /** Morton Z-value: interleave the low `bits` bits of each (already
    * normalized, non-negative) long column. Bit b of column i lands at
    * position b*n + i, so all columns share significance equally.
    * n_cols * bits must stay ≤ 63. */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"need 1..${63 / math.max(bits, 1)} columns at $bits bits")
    val n = cols.size
    val terms =
      for { b <- 0 until bits; (c, i) <- cols.zipWithIndex }
        yield shiftright(c, b).bitwiseAND(lit(1L)) * lit(1L << (b * n + i))
    terms.reduce(_ + _)
  }

  /** df + `zCol` = Z-value over `colNames`, each column min-max normalized
    * onto [0, 2^bits) — rank-preserving, null → 0 (nulls cluster at the
    * curve origin, matching NULLS FIRST scan stats). The min/max pass is
    * one 1-row aggregate.
    *
    * ==Precision on extreme-range long keys==
    * Normalization goes through `double`, whose 53-bit mantissa cannot
    * distinguish long values closer together than `span / 2^53`: when a
    * column's observed span exceeds 2^53 (e.g. keys spread across the
    * full int64 range), nearby keys collapse onto the same normalized
    * rank. The conversion stays MONOTONE (doubles preserve long ordering
    * direction), so results are never wrong — the Z-value only drives
    * physical layout — but clustering resolution quietly coarsens for
    * such keys; with the default 12 bits the rank already quantizes to
    * 2^12 buckets, so degradation only matters when span/2^53 exceeds a
    * bucket, i.e. spans beyond ~2^65 — unreachable for int64. For
    * sub-bucket fidelity on adversarial key spreads, pre-rank the column
    * (percent_rank) and cluster on the rank instead. ZOrderLayoutSpec
    * pins the full-int64-span case: no error, monotone z-values. */
  def withZValue(df: DataFrame, colNames: Seq[String], bits: Int = 12,
                 zCol: String = "_zv"): DataFrame = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"mn_$c"), max(col(c).cast("double")).as(s"mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val maxVal = (1L << bits) - 1
    val normed = colNames.zipWithIndex.map { case (c, i) =>
      // all-null / empty input: min() is null — degenerate to constant 0
      val mn = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      val span = math.max(mx - mn, Double.MinPositiveValue)
      when(col(c).isNull, lit(0L))
        .otherwise(((col(c).cast("double") - mn) / span * maxVal).cast("long"))
    }
    df.withColumn(zCol, interleaveBits(normed, bits))
  }

  /** Cluster `df` on the Z-curve over `colNames` and write parquet:
    * range-partition by Z-value (contiguous curve segments per file),
    * sort within partitions (contiguous curve runs per row group), drop
    * the helper column, write. `options` pass through to the writer
    * (e.g. small parquet.block.size to sharpen row-group granularity). */
  def zOrderWrite(df: DataFrame, colNames: Seq[String], path: String,
                  bits: Int = 12, numFiles: Int = 0,
                  options: Map[String, String] = Map.empty): Unit = {
    // the helper column is dropped before the write — a real user column
    // of the same name would be silently destroyed
    require(!df.columns.contains("_zv"),
      "zOrderWrite reserves the column name _zv; rename the input column")
    val z = withZValue(df, colNames, bits)
    val parted =
      if (numFiles > 0) z.repartitionByRange(numFiles, col("_zv"))
      else z.repartitionByRange(col("_zv"))
    parted.sortWithinPartitions("_zv")
      .drop("_zv")
      .write.options(options).parquet(path)
  }
}
