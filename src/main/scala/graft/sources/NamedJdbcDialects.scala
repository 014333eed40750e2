package graft.sources

import java.util.Locale

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types._

/**
  * Named-engine JDBC dialects for the reference's three RDBMS providers —
  * MySQL, PostgreSQL, SQLite (reference:
  * engine/src/io/data_provider/sql/{MySQL,PostgreSQL,SQLite}DataProvider.cpp
  * paired with the type parsers in engine/src/io/data_parser/sql/ and the
  * predicate transpiler in compatibility/SQLTranspiler.cpp). Each dialect
  * encodes the same three per-engine decisions the reference makes:
  *
  *  1. **Identifier quoting** for the pushed-down SELECT
  *     (build_select_query, AbstractSQLDataProvider.cpp:53-87 + the
  *     transpiled WHERE): backticks for MySQL, double quotes for
  *     PostgreSQL/SQLite.
  *  2. **Type mapping** from the engine's reported column type to the
  *     dataframe type, mirroring parse_mysql_column_type
  *     (MySQLParser.cpp:63-81), parse_postgresql_column_type
  *     (PostgreSQLParser.cpp:121-150), parse_sqlite_column_type
  *     (SQLiteParser.cpp:58-81) — including the reference's deliberate
  *     degradations (DECIMAL → float64, context.py:484-491) and the
  *     §1.2 unsigned widenings (uint8 → smallint, uint64 → decimal(20,0))
  *     where the reference picked an unsigned cudf type.
  *  3. **Batched scan shape**: the reference paginates every engine scan
  *     with `LIMIT <batch> OFFSET <node-strided offset>`
  *     (AbstractSQLDataProvider.cpp:70-71); Spark's equivalent is the
  *     LIMIT/OFFSET clause hooks plus numPartitions/partitionColumn
  *     striding, which these dialects leave at the (identical) default
  *     rendering.
  *
  * Where a reported type matches none of the reference parser's rules the
  * dialect returns None and Spark's driver-reported JDBC type applies —
  * same effect as the parser's implicit fall-through.
  *
  * No driver jars for these engines exist in-sandbox (SURVEY §8.5), so
  * there is no live-wire path; the dialect SQL generation itself is
  * golden-tested (NamedJdbcDialectsSpec) exactly like the reference's
  * transpiler unit surface. The Derby (generic JDBC) and HiveServer2
  * integrations prove the wire path end-to-end.
  */
private[graft] object NamedJdbcDialects {
  private val all = Seq(MySqlGraftDialect, PostgresGraftDialect, SqliteGraftDialect)
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[JdbcDialect]()

  /** Idempotently prepend all three dialects into Spark's registry. */
  def register(): Unit = all.foreach(registerOne)

  /** Register ONLY the dialect (if any) that handles `url`. Spark's
    * dialect registry is process-global, so registering all three on any
    * JDBC table creation would silently change UNRELATED `spark.read
    * .jdbc` calls elsewhere in the JVM (e.g. the DECIMAL → double
    * degrade applying to a read that never opted into engine semantics).
    * Scoping registration to the engine-registered URL keeps the blast
    * radius to engines the caller actually connected through this
    * context. */
  def registerFor(url: String): Unit =
    all.filter(_.canHandle(url)).foreach(registerOne)

  private def registerOne(d: JdbcDialect): Unit =
    if (registered.add(d)) JdbcDialects.registerDialect(d)
}

/** MySQL: backtick quoting (default sql_mode has no ANSI_QUOTES — a
  * double-quoted identifier would parse as a string literal);
  * MySQLParser.cpp type table. The reference transpiler additionally
  * wraps pushed timestamp literals in double quotes
  * (SQLTranspiler.cpp:119-128) — valid only without ANSI_QUOTES; Spark's
  * single-quoted rendering is the mode-independent equivalent and is what
  * compileValue keeps. */
private[graft] object MySqlGraftDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:mysql")

  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                               md: MetadataBuilder): Option[DataType] = {
    val t = typeName.toUpperCase(Locale.ROOT)
    // string/binary family first, as in mysql_is_cudf_string
    // (MySQLParser.cpp:38-55): ENUM/SET/BLOB variants included
    val stringPrefixes = Seq("CHAR", "VARCHAR", "BINARY", "VARBINARY",
      "TINYBLOB", "TINYTEXT", "TEXT", "BLOB", "MEDIUMTEXT", "MEDIUMBLOB",
      "LONGTEXT", "LONGBLOB", "ENUM", "SET")
    if (stringPrefixes.exists(t.startsWith)) Some(StringType)
    // UNSIGNED columns BEFORE the signed prefix rules: the reference
    // parser's prefix match would mis-type "INT UNSIGNED" as INT32 (its
    // CHANGELOG #1464 intent is unsigned support); this library's §1.2
    // widening contract is the faithful semantics — same-width signed
    // would overflow the upper half-range on a live wire.
    else if (t.contains("UNSIGNED")) {
      if (t.startsWith("TINYINT")) Some(ShortType)        // uint8 → smallint
      else if (t.startsWith("SMALLINT")) Some(IntegerType) // uint16 → int
      else if (t.startsWith("MEDIUMINT")) Some(IntegerType) // uint24 fits int32
      else if (t.startsWith("BIGINT")) Some(DecimalType(20, 0)) // uint64
      else if (t.startsWith("INT")) Some(LongType)        // uint32 → bigint
      else None
    }
    else if (t.startsWith("BOOL") || t == "TINYINT(1)") Some(BooleanType)
    else if (t.startsWith("TINYINT")) Some(ByteType)
    else if (t.startsWith("INT")) Some(IntegerType) // INT/INTEGER before BIGINT is safe: prefix differs
    else if (t.startsWith("BIGINT")) Some(LongType)
    else if (t.startsWith("FLOAT")) Some(FloatType)
    else if (t.startsWith("DOUBLE")) Some(DoubleType)
    else if (t == "DATE") Some(DateType)                  // TIMESTAMP_DAYS
    else if (t == "TIME") Some(TimestampType)             // TIMESTAMP_SECONDS (no date part)
    else if (t.startsWith("DATETIME") || t.startsWith("TIMESTAMP")) Some(TimestampType)
    else if (t.startsWith("YEAR")) Some(ByteType)         // INT8
    else if (t.startsWith("DECIMAL")) Some(DoubleType)    // reference degrades DECIMAL → float64
    else None
  }
}

/** PostgreSQL: ANSI double-quote quoting; PostgreSQLParser.cpp type
  * table. time-with/without-time-zone maps to a cudf DURATION in the
  * reference, which its own docs list as an unsupported column type
  * (docsrc dtypes.rst) — left to Spark's default here for the same
  * effect. */
private[graft] object PostgresGraftDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:postgresql")

  override def quoteIdentifier(colName: String): String =
    "\"" + colName.replace("\"", "\"\"") + "\""

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                               md: MetadataBuilder): Option[DataType] = {
    val t = typeName.toLowerCase(Locale.ROOT)
    // BOTH name families are matched: the reference reads catalog-style
    // names from information_schema ("integer", "character varying",
    // "timestamp with time zone" — what PostgreSQLParser.cpp switches
    // on), while the pgjdbc driver's getColumnTypeName reports pg_type
    // names ("int4", "varchar", "timestamptz"). A live Spark read sees
    // the LATTER, so without the aliases every reference-mirroring rule
    // would silently fall through to the built-in dialect.
    val stringTypes = Set("character", "character varying", "bytea", "text",
      "anyarray", "name", "varchar", "bpchar")
    if (stringTypes(t)) Some(StringType)
    else t match {
      case "smallint" | "smallserial" | "int2"       => Some(ShortType)
      case "integer" | "serial" | "int4"             => Some(IntegerType)
      case "bigint" | "bigserial" | "int8"           => Some(LongType)
      // parser says DECIMAL64, but the engine then degrades every DECIMAL
      // column to float64 at registration (context.py:484-491,
      // expression_utils.cpp:1082-1084) — the degraded type is what a
      // reference user's query actually sees
      case "decimal" | "numeric"                     => Some(DoubleType)
      case "real" | "float4"                         => Some(FloatType)
      case "double precision" | "float8"             => Some(DoubleType)
      case "boolean" | "bool"                        => Some(BooleanType)
      case "date"                                    => Some(DateType)
      case "money"                                   => Some(DecimalType(20, 0)) // uint64 → §1.2 widening
      case "timestamp without time zone" | "timestamp with time zone" |
           "timestamp" | "timestamptz"               => Some(TimestampType)
      case _                                         => None
    }
  }
}

/** SQLite: double-quote quoting; SQLiteParser.cpp type table, preserving
  * the reference's quirks verbatim — `smallint` → INT8 (not 16) and
  * `real` → FLOAT32 (SQLite stores 8-byte reals; the reference still
  * picked float32) — because matching the reference's observable schema
  * is the contract. Unsigned picks widen per §1.2: boolean (UINT8) →
  * smallint, `unsigned big int` (UINT64) → decimal(20,0). */
private[graft] object SqliteGraftDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:sqlite")

  override def quoteIdentifier(colName: String): String =
    "\"" + colName.replace("\"", "\"\"") + "\""

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                               md: MetadataBuilder): Option[DataType] = {
    val t = typeName.toLowerCase(Locale.ROOT)
    val stringPrefixes = Seq("character", "varchar", "char",
      "varying character", "nchar", "native character", "nvarchar",
      "text", "clob", "string")
    if (stringPrefixes.exists(t.startsWith)) Some(StringType)
    else t match {
      case "tinyint" | "smallint"  => Some(ByteType) // smallint → INT8 is the reference's rule
      case "mediumint" | "int2"    => Some(ShortType)
      case "int" | "integer"       => Some(IntegerType)
      case "bigint" | "int8"       => Some(LongType)
      case "unsigned big int"      => Some(DecimalType(20, 0)) // uint64 widening
      case "real" | "float"        => Some(FloatType)
      case "double" | "double precision" => Some(DoubleType)
      case "decimal"               => Some(DoubleType) // same DECIMAL degrade
      case "boolean"               => Some(ShortType)  // UINT8 → smallint widening
      case "date" | "datetime"     => Some(TimestampType) // TIMESTAMP_MILLISECONDS
      case _                       => None
    }
  }
}
