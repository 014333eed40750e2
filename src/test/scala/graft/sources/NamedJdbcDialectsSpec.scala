package graft.sources

import org.apache.spark.sql.connector.expressions.{Expression, Expressions}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
  * Golden-SQL tests for the three named-engine dialects, mirroring the
  * reference transpiler's unit surface without a live server (no
  * MySQL/PG/SQLite driver jars exist in-sandbox — SURVEY §8.5; the wire
  * path itself is proven by the Derby and HiveServer2 integrations).
  * Pins, per engine:
  *  - identifier quoting in rendered predicates (build_select_query +
  *    transpile_predicate, AbstractSQLDataProvider.cpp:53-87);
  *  - the IS NULL / IS NOT NULL postfix rendering and parenthesized
  *    boolean composition (SQLTranspiler.cpp:30-99, get_default_operators);
  *  - literal rendering (timestamp/date/quote-escaped string,
  *    SQLTranspiler.cpp:119-128);
  *  - the LIMIT/OFFSET pagination clauses every reference scan is built
  *    from (AbstractSQLDataProvider.cpp:70-71);
  *  - the engine-type → Spark-type tables from the reference parsers
  *    (MySQLParser.cpp:63-81, PostgreSQLParser.cpp:121-150,
  *    SQLiteParser.cpp:58-81), including the deliberate quirks.
  */
class NamedJdbcDialectsSpec extends AnyFunSuite {

  private val md = new MetadataBuilder
  private def typ(d: JdbcDialect, name: String): Option[DataType] =
    d.getCatalystType(java.sql.Types.OTHER, name, 0, md)

  private def pred(name: String, es: Expression*): Predicate =
    new Predicate(name, es.toArray)
  private def compile(d: JdbcDialect, e: Expression): String =
    d.compileExpression(e).getOrElse(fail(s"dialect could not compile $e"))

  // The reference pushes this exact shape of predicate down to every
  // engine: transpiled filters AND-composed with comparisons and
  // IS [NOT] NULL checks (set_predicate_pushdown → transpile_predicate).
  private def tpchQ6Predicate = pred("AND",
    pred("IS_NOT_NULL", Expressions.column("l_shipdate")),
    pred(">=", Expressions.column("l_discount"), Expressions.literal(0.05d)))

  test("mysql: backtick quoting, postfix null checks, parenthesized AND") {
    val d = MySqlGraftDialect
    assert(d.canHandle("jdbc:mysql://host:3306/db"))
    assert(d.quoteIdentifier("l_shipdate") == "`l_shipdate`")
    assert(d.quoteIdentifier("we`ird") == "`we``ird`") // embedded quote doubles
    assert(compile(d, pred("IS_NULL", Expressions.column("c_name"))) == "`c_name` IS NULL")
    assert(compile(d, pred("IS_NOT_NULL", Expressions.column("c_name"))) == "`c_name` IS NOT NULL")
    val sql = compile(d, tpchQ6Predicate)
    assert(sql == "(`l_shipdate` IS NOT NULL) AND (`l_discount` >= 0.05)", sql)
  }

  test("postgres/sqlite: ANSI double-quote quoting in rendered predicates") {
    for (d <- Seq[JdbcDialect](PostgresGraftDialect, SqliteGraftDialect)) {
      assert(d.quoteIdentifier("l_shipdate") == "\"l_shipdate\"")
      assert(d.quoteIdentifier("we\"ird") == "\"we\"\"ird\"")
      val sql = compile(d, tpchQ6Predicate)
      assert(sql == "(\"l_shipdate\" IS NOT NULL) AND (\"l_discount\" >= 0.05)", sql)
    }
    assert(PostgresGraftDialect.canHandle("jdbc:postgresql://h/db"))
    assert(SqliteGraftDialect.canHandle("jdbc:sqlite:/tmp/x.db"))
    assert(!SqliteGraftDialect.canHandle("jdbc:mysql://h/db"))
  }

  test("literal rendering: quote-escaped strings, quoted date/timestamp") {
    for (d <- Seq[JdbcDialect](MySqlGraftDialect, PostgresGraftDialect, SqliteGraftDialect)) {
      // single-quote escape: the injection-safe rendering of O'Brien
      assert(d.compileValue("O'Brien") == "'O''Brien'")
      // the transpiler quotes temporal literals (SQLTranspiler.cpp:119-128
      // uses double quotes — MySQL-only syntax without ANSI_QUOTES; the
      // single-quoted form is every engine's portable equivalent)
      assert(d.compileValue(java.sql.Date.valueOf("1994-01-01")) == "'1994-01-01'")
      assert(d.compileValue(java.sql.Timestamp.valueOf("1995-03-15 01:02:03")) ==
        "'1995-03-15 01:02:03.0'")
    }
  }

  test("pagination clauses match the reference's batched scan shape") {
    // build_select_query appends " LIMIT <batch> OFFSET <stride>" on all
    // three engines (AbstractSQLDataProvider.cpp:70-71)
    for (d <- Seq[JdbcDialect](MySqlGraftDialect, PostgresGraftDialect, SqliteGraftDialect)) {
      assert(d.getLimitClause(131072).trim == "LIMIT 131072")
      assert(d.getOffsetClause(262144).trim == "OFFSET 262144")
    }
  }

  test("mysql type table mirrors MySQLParser.cpp") {
    val d = MySqlGraftDialect
    for (t <- Seq("VARCHAR(255)", "CHAR(4)", "TINYTEXT", "TEXT(100)",
        "MEDIUMTEXT", "LONGTEXT", "ENUM('a','b')", "SET('x')", "BLOB",
        "VARBINARY(16)"))
      assert(typ(d, t).contains(StringType), t)
    assert(typ(d, "BOOL").contains(BooleanType))
    assert(typ(d, "BOOLEAN").contains(BooleanType))
    assert(typ(d, "TINYINT(1)").contains(BooleanType)) // the MySQL bool idiom
    assert(typ(d, "TINYINT(4)").contains(ByteType))
    assert(typ(d, "INT(11)").contains(IntegerType))
    assert(typ(d, "INTEGER").contains(IntegerType))
    assert(typ(d, "BIGINT(20)").contains(LongType))
    assert(typ(d, "FLOAT").contains(FloatType))
    assert(typ(d, "DOUBLE").contains(DoubleType))
    assert(typ(d, "DATE").contains(DateType))           // TIMESTAMP_DAYS
    assert(typ(d, "TIME").contains(TimestampType))      // TIMESTAMP_SECONDS
    assert(typ(d, "DATETIME(3)").contains(TimestampType))
    assert(typ(d, "TIMESTAMP").contains(TimestampType))
    assert(typ(d, "YEAR").contains(ByteType))           // INT8
    // the engine degrades DECIMAL to float64 (context.py:484-491)
    assert(typ(d, "DECIMAL(12,2)").contains(DoubleType))
    // SMALLINT has no rule in parse_mysql_column_type — fall through
    assert(typ(d, "SMALLINT(6)").isEmpty)
    // UNSIGNED columns take the §1.2 widenings, not the same-width signed
    // type the reference's prefix match would pick (its CHANGELOG #1464
    // intent is real unsigned support; same-width signed overflows the
    // upper half-range on a live wire)
    assert(typ(d, "TINYINT UNSIGNED").contains(ShortType))
    assert(typ(d, "TINYINT(3) UNSIGNED").contains(ShortType))
    assert(typ(d, "SMALLINT UNSIGNED").contains(IntegerType))
    assert(typ(d, "MEDIUMINT UNSIGNED").contains(IntegerType))
    assert(typ(d, "INT UNSIGNED").contains(LongType))
    assert(typ(d, "INT(10) UNSIGNED").contains(LongType))
    assert(typ(d, "BIGINT UNSIGNED").contains(DecimalType(20, 0)))
  }

  test("postgres type table mirrors PostgreSQLParser.cpp") {
    val d = PostgresGraftDialect
    for (t <- Seq("character", "character varying", "bytea", "text", "name"))
      assert(typ(d, t).contains(StringType), t)
    assert(typ(d, "smallint").contains(ShortType))
    assert(typ(d, "integer").contains(IntegerType))
    assert(typ(d, "bigint").contains(LongType))
    assert(typ(d, "smallserial").contains(ShortType))
    assert(typ(d, "serial").contains(IntegerType))
    assert(typ(d, "bigserial").contains(LongType))
    assert(typ(d, "decimal").contains(DoubleType)) // DECIMAL64 then degraded
    assert(typ(d, "numeric").contains(DoubleType))
    assert(typ(d, "real").contains(FloatType))
    assert(typ(d, "double precision").contains(DoubleType))
    assert(typ(d, "boolean").contains(BooleanType))
    assert(typ(d, "date").contains(DateType))
    assert(typ(d, "money").contains(DecimalType(20, 0))) // UINT64 → §1.2 widening
    assert(typ(d, "timestamp without time zone").contains(TimestampType))
    assert(typ(d, "timestamp with time zone").contains(TimestampType))
    // time-of-day → cudf DURATION, which the reference itself documents
    // as unsupported; the dialect leaves it to the driver default
    assert(typ(d, "time without time zone").isEmpty)
    // pgjdbc reports pg_type names (int4/varchar/timestamptz...), not the
    // information_schema names the reference's libpq path reads — a live
    // Spark read sees the driver names, so both families must map
    assert(typ(d, "int2").contains(ShortType))
    assert(typ(d, "int4").contains(IntegerType))
    assert(typ(d, "int8").contains(LongType))
    assert(typ(d, "float4").contains(FloatType))
    assert(typ(d, "float8").contains(DoubleType))
    assert(typ(d, "bool").contains(BooleanType))
    assert(typ(d, "varchar").contains(StringType))
    assert(typ(d, "bpchar").contains(StringType))
    assert(typ(d, "timestamptz").contains(TimestampType))
    assert(typ(d, "timestamp").contains(TimestampType))
  }

  test("sqlite type table mirrors SQLiteParser.cpp, quirks preserved") {
    val d = SqliteGraftDialect
    for (t <- Seq("character(20)", "varchar(255)", "varying character(255)",
        "nchar(55)", "native character(70)", "nvarchar(100)", "text", "clob"))
      assert(typ(d, t).contains(StringType), t)
    assert(typ(d, "tinyint").contains(ByteType))
    assert(typ(d, "smallint").contains(ByteType)) // reference maps smallint → INT8, not INT16
    assert(typ(d, "mediumint").contains(ShortType))
    assert(typ(d, "int2").contains(ShortType))
    assert(typ(d, "int").contains(IntegerType))
    assert(typ(d, "integer").contains(IntegerType))
    assert(typ(d, "bigint").contains(LongType))
    assert(typ(d, "int8").contains(LongType))
    assert(typ(d, "unsigned big int").contains(DecimalType(20, 0))) // UINT64 widening
    assert(typ(d, "real").contains(FloatType)) // reference picked FLOAT32 despite 8-byte storage
    assert(typ(d, "float").contains(FloatType))
    assert(typ(d, "double").contains(DoubleType))
    assert(typ(d, "double precision").contains(DoubleType))
    assert(typ(d, "decimal").contains(DoubleType))
    assert(typ(d, "boolean").contains(ShortType)) // UINT8 → smallint widening
    assert(typ(d, "date").contains(TimestampType))     // TIMESTAMP_MILLISECONDS
    assert(typ(d, "datetime").contains(TimestampType))
  }

  // NOTE: declared BEFORE the register()-all test — ScalaTest runs tests
  // in declaration order and the registry is JVM-global.
  test("registerFor scopes registration to the engine actually connected") {
    // registering a Derby url must not install ANY of the named dialects:
    // mysql urls still route to Spark's built-in (DECIMAL stays decimal)
    NamedJdbcDialects.registerFor("jdbc:derby:;databaseName=/tmp/x")
    assert(!JdbcDialects.get("jdbc:mysql://h/db")
      .getCatalystType(java.sql.Types.OTHER, "DECIMAL(12,2)", 0, md)
      .contains(DoubleType))
    // a sqlite url installs exactly the sqlite dialect
    NamedJdbcDialects.registerFor("jdbc:sqlite:/tmp/x.db")
    assert(JdbcDialects.get("jdbc:sqlite:/tmp/x.db") eq SqliteGraftDialect)
  }

  test("registration is idempotent and routes urls to the named dialects") {
    NamedJdbcDialects.register()
    NamedJdbcDialects.register() // second call is a no-op
    // Spark's built-in MySQL/Postgres dialects also match these urls, so
    // the registry returns an AggregatedDialect — registered dialects are
    // PREPENDED, so ours win every rule they define. Assert on routed
    // behavior: the reference-specific type degradations and quoting.
    val my = JdbcDialects.get("jdbc:mysql://h/db")
    assert(my.quoteIdentifier("c") == "`c`")
    assert(my.getCatalystType(java.sql.Types.OTHER, "DECIMAL(12,2)", 0, md)
      .contains(DoubleType)) // ours; Spark's built-in keeps DecimalType
    val pg = JdbcDialects.get("jdbc:postgresql://h/db")
    assert(pg.getCatalystType(java.sql.Types.OTHER, "money", 0, md)
      .contains(DecimalType(20, 0))) // ours; built-in maps money → None/string
    // no built-in sqlite dialect exists: the registry returns ours alone
    assert(JdbcDialects.get("jdbc:sqlite:/tmp/x.db") eq SqliteGraftDialect)
  }
}
