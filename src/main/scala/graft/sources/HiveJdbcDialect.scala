package graft.sources

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

/**
  * JDBC dialect for HiveServer2 endpoints (`jdbc:hive2://...`) — the
  * engine-specific half of the RDBMS source surface (reference: each
  * provider pairs a connector with a dialect transpiler,
  * engine/src/io/data_provider/sql/MySQLDataProvider.cpp +
  * io/data_parser/sql/SQLTranspiler.cpp; this is the same job for a
  * HiveServer2/Spark-thrift endpoint).
  *
  * The one semantic that MUST differ from Spark's default dialect:
  * identifier quoting. HiveQL treats double-quoted text as a STRING
  * LITERAL, so the default `SELECT "col" FROM t` returns the constant
  * 'col' for every row — silently wrong data, not an error. Hive quotes
  * identifiers with backticks.
  */
private[graft] object HiveJdbcDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:hive2")

  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  private val registered = new AtomicBoolean(false)

  /** Idempotently install the dialect into Spark's dialect registry
    * (JdbcDialects keeps a prepend-list; registering once is enough). */
  def register(): Unit =
    if (registered.compareAndSet(false, true)) JdbcDialects.registerDialect(this)
}
