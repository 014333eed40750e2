package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
  * Synthetic full-schema TPC-H-family tables matching the reference's E2E
  * test catalog (reference: tests/BlazingSQLTest/DataBase/createSchema.py
  * :580-830 — column names/dtypes for customer, region, nation, lineitem,
  * orders, supplier, part, partsupp, plus the extraTables bool_orders and
  * interval_table, createSchema.py:41-42,637-661).
  *
  * The driver testdata carries trimmed schemas (no comment/address/phone
  * columns, no partsupp), so the dialect proof generates its own small
  * deterministic relations with every reference column present. Values are
  * id-derived (seedless, reproducible); the `withNulls` variant nulls
  * non-key columns on id % 13 == 0, mirroring the reference's WITH_NULLS
  * datasets (createSchema.py copy_data_with_nulls).
  */
object ReferenceTables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "orders", "lineitem",
    "supplier", "part", "partsupp", "bool_orders", "interval_table")

  /** Register every table as a temp view on `spark`. */
  def register(spark: SparkSession, withNulls: Boolean): Unit =
    names.foreach(n => build(spark, n, withNulls).createOrReplaceTempView(n))

  def build(spark: SparkSession, table: String, withNulls: Boolean): DataFrame = {
    val df = table match {
      case "region" =>
        spark.range(5).selectExpr(
          "cast(id as int) as r_regionkey",
          "element_at(array('AFRICA','AMERICA','ASIA','EUROPE','MIDDLE EAST'), cast(id as int)+1) as r_name",
          "concat('region comment ', id) as r_comment")
      case "nation" =>
        spark.range(25).selectExpr(
          "cast(id as int) as n_nationkey",
          "concat('NATION_', lpad(cast(id as string), 2, '0')) as n_name",
          "cast(id % 5 as int) as n_regionkey",
          "concat('nation comment ', id) as n_comment")
      case "customer" =>
        spark.range(1, 151).selectExpr(
          "cast(id as int) as c_custkey",
          "concat('Customer#', lpad(cast(id as string), 9, '0')) as c_name",
          "concat('Address ', id * 17 % 991) as c_address",
          "cast(id % 25 as int) as c_nationkey",
          "concat(lpad(cast(10 + id % 25 as string), 2, '0'), '-', lpad(cast(id * 7 % 1000 as string), 3, '0'), '-', lpad(cast(id * 13 % 1000 as string), 3, '0')) as c_phone",
          "cast((id * 7919 % 110000) / 10.0 - 999.0 as double) as c_acctbal",
          "element_at(array('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'), cast(id % 5 as int)+1) as c_mktsegment",
          "concat('customer comment ', id) as c_comment")
      case "orders" | "bool_orders" =>
        val base = spark.range(1, 601).selectExpr(
          "id as o_orderkey",
          "cast(id * 31 % 150 + 1 as int) as o_custkey",
          "element_at(array('F','O','P'), cast(id % 3 as int)+1) as o_orderstatus",
          "cast((id * 104729 % 45000000) / 100.0 as double) as o_totalprice",
          "date_add(date'1992-01-01', cast(id * 7 % 2406 as int)) as o_orderdate",
          "element_at(array('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'), cast(id % 5 as int)+1) as o_orderpriority",
          "concat('Clerk#', lpad(cast(id * 3 % 1000 as string), 9, '0')) as o_clerk",
          "cast(0 as int) as o_shippriority",
          "concat('order comment ', id) as o_comment")
        if (table == "bool_orders") base.withColumn("o_confirmed", expr("o_orderkey % 2 = 0"))
        else base
      case "lineitem" =>
        spark.range(1500).selectExpr(
          "cast(id / 3 as bigint) + 1 as l_orderkey",
          "id % 200 + 1 as l_partkey",
          "id % 50 + 1 as l_suppkey",
          "cast(id % 7 + 1 as int) as l_linenumber",
          "cast(id % 50 + 1 as double) as l_quantity",
          "cast((id * 31627 % 9500000) / 100.0 + 901.0 as double) as l_extendedprice",
          "cast(id % 11 as double) / 100.0 as l_discount",
          "cast(id % 9 as double) / 100.0 as l_tax",
          "element_at(array('A','N','R'), cast(id % 3 as int)+1) as l_returnflag",
          "element_at(array('F','O'), cast(id % 2 as int)+1) as l_linestatus",
          "date_add(date'1992-01-02', cast(id * 11 % 2526 as int)) as l_shipdate",
          "date_add(date'1992-01-02', cast((id * 11 + 30) % 2526 as int)) as l_commitdate",
          "date_add(date'1992-01-02', cast((id * 11 + 45) % 2526 as int)) as l_receiptdate",
          "element_at(array('DELIVER IN PERSON','COLLECT COD','NONE','TAKE BACK RETURN'), cast(id % 4 as int)+1) as l_shipinstruct",
          "element_at(array('AIR','FOB','MAIL','RAIL','REG AIR','SHIP','TRUCK'), cast(id % 7 as int)+1) as l_shipmode",
          "concat('lineitem comment ', id) as l_comment")
      case "supplier" =>
        spark.range(1, 51).selectExpr(
          "id as s_suppkey",
          "concat('Supplier#', lpad(cast(id as string), 9, '0')) as s_name",
          "concat('Supplier Address ', id * 23 % 677) as s_address",
          "cast(id % 25 as int) as s_nationkey",
          "concat(lpad(cast(10 + id % 25 as string), 2, '0'), '-', lpad(cast(id * 11 % 1000 as string), 3, '0'), '-', lpad(cast(id * 29 % 1000 as string), 3, '0')) as s_phone",
          "cast((id * 6151 % 110000) / 10.0 - 999.0 as double) as s_acctbal",
          "concat('supplier comment ', id) as s_comment")
      case "part" =>
        spark.range(1, 201).selectExpr(
          "id as p_partkey",
          "concat(element_at(array('almond','antique','aquamarine','azure','beige'), cast(id % 5 as int)+1), ' ', element_at(array('lace','lemon','linen','magenta','maroon'), cast(id % 5 as int)+1), ' part ', id) as p_name",
          "concat('Manufacturer#', cast(id % 5 + 1 as int)) as p_mfgr",
          "concat('Brand#', cast(id % 5 + 1 as int), cast(id % 5 + 1 as int)) as p_brand",
          "concat(element_at(array('STANDARD','SMALL','MEDIUM','LARGE','ECONOMY','PROMO'), cast(id % 6 as int)+1), ' ', element_at(array('ANODIZED','BURNISHED','PLATED','POLISHED','BRUSHED'), cast(id % 5 as int)+1), ' ', element_at(array('TIN','NICKEL','BRASS','STEEL','COPPER'), cast(id % 5 as int)+1)) as p_type",
          "id % 50 + 1 as p_size",
          "concat(element_at(array('SM','MED','LG','JUMBO','WRAP'), cast(id % 5 as int)+1), ' ', element_at(array('CASE','BOX','BAG','JAR','PKG','PACK','CAN','DRUM'), cast(id % 8 as int)+1)) as p_container",
          "cast((90000 + (id / 10) * 100 + id % 1000) / 100.0 as float) as p_retailprice",
          "concat('part comment ', id) as p_comment")
      case "partsupp" =>
        spark.range(400).selectExpr(
          "id % 200 + 1 as ps_partkey",
          "(id * 7) % 50 + 1 as ps_suppkey",
          "id * 13 % 9999 + 1 as ps_availqty",
          "cast((id * 443 % 100000) / 100.0 as float) as ps_supplycost",
          "concat('partsupp comment ', id) as ps_comment")
      case "interval_table" =>
        spark.range(100).selectExpr(
          "cast(id as int) as i_id",
          "make_dt_interval(0, 0, 0, cast(id % 4000 as int)) as i_duration_s",
          "make_dt_interval(0, 0, 0, cast(id % 4000 as int) / 1000.0) as i_duration_ms")
      case other => sys.error(s"unknown reference table $other")
    }
    if (withNulls) nullify(df, table) else df
  }

  /** Null out non-key columns on a deterministic 1-in-13 stripe (keys and
    * the key-adjacent join columns stay non-null so joins still relate). */
  private def nullify(df: DataFrame, table: String): DataFrame = {
    val keep = Set(
      "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "o_orderkey",
      "l_orderkey", "l_linenumber", "s_suppkey", "p_partkey",
      "ps_partkey", "ps_suppkey", "i_id")
    val keyCol = df.columns.head
    df.columns.foldLeft(df) { (d, c) =>
      if (keep(c)) d
      else d.withColumn(c, when(expr(s"abs(hash($keyCol, '$c')) % 13 = 0"), lit(null)).otherwise(col(c)))
    }
  }
}
