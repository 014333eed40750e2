package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column-level corpus profiler — the `ANALYZE`/data-quality report every
 * ingestion pipeline runs before training on a new dump (null rates,
 * cardinalities, value ranges per column; the Deequ/profiler pattern).
 * The reference exposes table metadata (context.py describe_table) but no
 * computed statistics; this is the data-quality superset the curation
 * stack needs.
 *
 * One aggregation pass over the table produces every metric for every
 * requested column (Catalyst plans the multi-DISTINCT agg with one
 * Expand — a single scan, map-side partials for the non-distinct
 * metrics), then one `stack` pivots the 1-row result into the per-column
 * report. No shuffle carries table-sized data: the exchange moves
 * partial aggregate states only.
 *
 * Exact-count contract: n_distinct is EXACT (count_distinct) by default
 * because the report is an oracle-checked artifact — but exact
 * multi-DISTINCT costs one Expand, which multiplies the scan's row
 * volume by C+1 at C profiled columns. WIDTH WARNING: at a 200-column
 * table the Expand alone is a 200× row blowup; for wide tables pass
 * `approxDistinct = true`, which swaps count_distinct →
 * approx_count_distinct (single-pass HLL partials, NO Expand — every
 * metric is then a plain map-side-combinable aggregate) and leaves every
 * other column of the report bit-identical (spec-pinned). The portable
 * cross-engine sketch alternative is TextAnalysis.hllDistinctTokens
 * (q100). min/max are computed on the NATIVE type (numeric min, not
 * lexicographic) and cast to string afterwards, so the report schema is
 * uniform across heterogeneous columns.
 */
object Profile {

  def columnProfile(df: DataFrame, cols: Seq[String],
                    approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    // the stack() pivot below interpolates the names into SQL text; a
    // quote/backtick would break the parse or mislabel rows, so reject
    // rather than emit a wrong report (profiled tables come from parquet
    // /JDBC schemas where such names are illegal anyway)
    cols.foreach { c =>
      require(!c.exists(ch => ch == '`' || ch == '\'' || ch == '\\'),
        s"columnProfile: unsupported character in column name: $c")
    }
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __n, `${c}__nn`, `${c}__nd`, `${c}__mn`, `${c}__mx`"
    }.mkString(", ")
    one
      .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nonnull, n_distinct, min_str, max_str)"))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"),
        col("n_distinct"), col("min_str"), col("max_str"))
  }
}
