package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    TpchQueries,
    ExpressionQueries,
    WindowQueries,
    EventQueries,
    PipelineQueries,
    TemporalQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs TPC-H Q1 through the EngineContext SQL path (catalog + spark.sql),
    * the analog of bc.create_table + bc.sql (reference context.py:2079,:3071). */
  def entry(spark: SparkSession): DataFrame = {
    val ctx = EngineContext.forDir(spark, "/root/testdata/sf0.001")
    ctx.sql(
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |       avg(l_quantity) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
