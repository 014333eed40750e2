package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.scalatest.funsuite.AnyFunSuite

/**
  * Unsigned-integer ingestion (SURVEY §1.2): the reference catalog carries
  * UINT8/16/32/64 column types (reference: algebra/blazingdb-calcite-core/
  * src/main/java/com/blazingdb/calcite/catalog/domain/
  * CatalogColumnDataType.java:26-29; C++ support per CHANGELOG #1464).
  * Spark has no unsigned types, so ingestion widens each to the next
  * signed type that holds the full value range — smallint / int / bigint /
  * decimal(20,0) — which is also what Spark's parquet reader does for
  * unsigned logical annotations. Spark can't WRITE such files, so the
  * fixture is generated with parquet-java's example writer, storing the
  * unsigned max values as their raw two's-complement bits.
  */
class UnsignedTypesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("uint8/16/32/64 parquet columns widen to smallint/int/bigint/decimal(20,0) with full range") {
    val dir = Files.createTempDirectory("graft_uint").toFile.getAbsolutePath
    val file = s"$dir/u.parquet"

    val schema = Types.buildMessage()
      .optional(PrimitiveTypeName.INT32)
      .as(LogicalTypeAnnotation.intType(8, false)).named("u8")
      .optional(PrimitiveTypeName.INT32)
      .as(LogicalTypeAnnotation.intType(16, false)).named("u16")
      .optional(PrimitiveTypeName.INT32)
      .as(LogicalTypeAnnotation.intType(32, false)).named("u32")
      .optional(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.intType(64, false)).named("u64")
      .named("graft_uint")

    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(file))
      .withConf(new Configuration())
      .withType(schema)
      .build()
    val fac = new SimpleGroupFactory(schema)
    // (value, stored bits): unsigned values above the signed max are
    // written as their reinterpreted two's-complement representation
    val rows = Seq[(Int, Int, Long, java.math.BigInteger)](
      (0, 0, 0L, java.math.BigInteger.ZERO),
      (200, 40000, 3000000000L, new java.math.BigInteger("10000000000000000000")),
      (255, 65535, 4294967295L, new java.math.BigInteger("18446744073709551615")))
    rows.foreach { case (u8, u16, u32, u64) =>
      val g = fac.newGroup()
      g.add("u8", u8)
      g.add("u16", u16)
      g.add("u32", u32.toInt) // raw bits
      g.add("u64", u64.longValue()) // raw bits
      writer.write(g)
    }
    writer.close()

    val ctx = new EngineContext(spark)
    ctx.createTable("uints", file, "parquet")
    val df = spark.table("uints")
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "u8" -> "smallint", "u16" -> "int", "u32" -> "bigint", "u64" -> "decimal(20,0)"),
      df.schema.treeString)

    // the widened range is real: unsigned maxima survive, ordering and
    // aggregation behave as unsigned (no negative wraparound)
    val r = ctx.sql(
      "SELECT max(u8) AS m8, max(u16) AS m16, max(u32) AS m32, max(u64) AS m64, " +
      "count(*) AS over32 FROM uints WHERE u32 > 2147483647 OR u32 = 0 OR u32 = 3000000000")
      .collect()(0)
    assert(r.getShort(0) == 255)
    assert(r.getInt(1) == 65535)
    assert(r.getLong(2) == 4294967295L)
    assert(r.getDecimal(3).toBigInteger == new java.math.BigInteger("18446744073709551615"))
    assert(r.getLong(4) == 3L)
  }
}
