package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-group WINSORIZED statistics: clamp `value` to its group's
    * [pLo, pHi] exact interpolated percentiles and report the before/
    * after means plus clip counts — the outlier-robust score
    * normalization a curation pipeline applies before mixing quality
    * scores across sources (a source whose scorer saturates high would
    * otherwise dominate a mixture weighted on raw means).
    *
    * Exactness: percentile rule is the same (1-g)·lo + g·hi linear
    * interpolation as q58 / DuckDB quantile_cont. But NOT via the
    * `percentile` aggregate — that buffers every group value in ONE
    * aggregation cell (the q103-class state bomb: a 10B-row source is a
    * multi-GB cell). Instead the RANK-WALK form: row_number per group
    * (sort-based window — Spark's external sorter SPILLS, an aggregate
    * buffer cannot), keep only the ≤4 bracketing ranks per group, and
    * interpolate from those. State per task is the sort spill plus four
    * rows per group; the threshold relation is |groups|-sized and joins
    * back under AQE's own broadcast sizing (no forced hint — the q120
    * rule).
    *
    * Ties: row_number over (value) — tied values make rank assignment
    * among equals arbitrary, but the value AT a rank is unique, which is
    * all the interpolation reads. */
  def winsorizedStats(df: DataFrame, group: String, value: String,
                      pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("g")).orderBy(col("v"))
    val ranked = df
      .select(col(group).as("g"), col(value).cast("double").as("v"))
      .withColumn("rn", row_number().over(win))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
    // pos is 1-based: 1 + p*(n-1); keep floor and ceil ranks only
    def pos(p: Double) = lit(1.0) + lit(p) * (col("n") - 1).cast("double")
    def bracket(p: Double, name: String) = {
      val lo = floor(pos(p)).cast("long")
      val hi = ceil(pos(p)).cast("long")
      val g = pos(p) - floor(pos(p))
      // threshold rounded to 6dp BEFORE clamping: the two engines'
      // interpolation float-op orders differ by ~1 ulp ((1-g)·lo + g·hi
      // vs lo + g·(hi-lo)); clamping against the rounded value makes the
      // comparison identical cross-engine (the r6 doctrine applied to an
      // INTERMEDIATE, because it feeds comparisons, not just output)
      ranked.filter(col("rn") === lo || col("rn") === hi)
        .groupBy(col("g"))
        .agg(graft.Tables.r6((lit(1.0) - max(g)) *
            max(when(col("rn") === floor(pos(p)).cast("long"), col("v"))) +
          max(g) *
            max(when(col("rn") === ceil(pos(p)).cast("long"), col("v"))))
          .as(name))
    }
    val thresholds = bracket(pLo, "t_lo").join(bracket(pHi, "t_hi"), "g")
    val clipped = df
      .select(col(group).as("g"), col(value).cast("double").as("v"))
      .join(thresholds, "g")
      .withColumn("w", least(greatest(col("v"), col("t_lo")), col("t_hi")))
    clipped.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("t_lo"), 1).otherwise(0)).as("n_clip_lo"),
        sum(when(col("v") > col("t_hi"), 1).otherwise(0)).as("n_clip_hi"),
        graft.Tables.drnd(max(col("t_lo")), 4).as("p_lo"),
        graft.Tables.drnd(max(col("t_hi")), 4).as("p_hi"),
        graft.Tables.r6(avg(col("v"))).as("mean_raw"),
        graft.Tables.r6(avg(col("w"))).as("mean_wins"))
      .withColumnRenamed("g", group)
  }

  /** Cohen's kappa agreement between two binary classifiers, per group —
    * the "do my cheap rule filter and my learned classifier agree beyond
    * chance" eval every filter-stack change runs before shipping. Pure
    * integer confusion counts; kappa in RATIONAL form with one final
    * rounded divide (the bm25/tokenRarity doctrine): with marginal
    * products Pe·n² = (n00+n01)(n00+n10) + (n10+n11)(n01+n11),
    * kappa = (n·(n00+n11) − Pe·n²) / (n² − Pe·n²). One map-side-combinable
    * aggregation pass; group cells are 4 longs. */
  def agreementKappa(df: DataFrame, group: String, a: Column, b: Column)
    : DataFrame = {
    val ai = a.cast("boolean").cast("int")
    val bi = b.cast("boolean").cast("int")
    df.groupBy(col(group))
      .agg(
        sum(when(ai === 0 && bi === 0, 1).otherwise(0)).as("n00"),
        sum(when(ai === 0 && bi === 1, 1).otherwise(0)).as("n01"),
        sum(when(ai === 1 && bi === 0, 1).otherwise(0)).as("n10"),
        sum(when(ai === 1 && bi === 1, 1).otherwise(0)).as("n11"))
      .select(col(group), col("n00"), col("n01"), col("n10"), col("n11"),
        {
          val n = col("n00") + col("n01") + col("n10") + col("n11")
          val pe2 = (col("n00") + col("n01")) * (col("n00") + col("n10")) +
            (col("n10") + col("n11")) * (col("n01") + col("n11"))
          val num = n * (col("n00") + col("n11")) - pe2
          val den = n * n - pe2
          graft.Tables.r6(when(den === 0, lit(1.0))
            .otherwise(num.cast("double") / den.cast("double"))).as("kappa")
        })
  }
}
