package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
import org.scalatest.funsuite.AnyFunSuite

/**
  * Second JDBC engine, end to end over a REAL HiveServer2 wire protocol:
  * the reference ships engine-specific RDBMS providers (MySQL/PostgreSQL/
  * SQLite providers under engine/src/io/data_provider/sql) whose quirks
  * live in a SQL transpiler. The sandbox has no MySQL/PostgreSQL/SQLite
  * driver jars, but it DOES have hive-jdbc + Spark's own thrift server, so
  * this spec proves the same provider story against a second, genuinely
  * different dialect than Derby: HiveQL, where double-quoted identifiers
  * are string literals, so Spark's default JDBC quoting returns constant
  * strings instead of column data. HiveJdbcDialect (backtick quoting)
  * fixes that — value assertions below fail without it.
  */
class HiveJdbcEngineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("createTableJdbc against a HiveServer2 endpoint: correct values + pushdown") {
    // a metastore-backed table so every thrift-server session sees it
    // (per-connection sessions don't share this session's temp views)
    spark.range(5).select(
        col("id").cast("int").as("r_regionkey"),
        concat(lit("REGION_"), col("id")).as("r_label"))
      .write.mode("overwrite").saveAsTable("graft_jdbc_region")

    val server = HiveThriftServer2.startWithContext(spark.sqlContext)
    try {
      // the thrift service binds asynchronously on whatever port its
      // HiveConf resolved — ask the service itself rather than guessing
      import scala.jdk.CollectionConverters._
      val thrift = server.getServices.asScala.collectFirst {
        case t: org.apache.hive.service.cli.thrift.ThriftCLIService => t
      }.getOrElse(fail("no ThriftCLIService inside HiveThriftServer2"))
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (thrift.getPortNumber <= 0) {
        if (System.nanoTime() > deadline) fail("thrift server never bound a port")
        Thread.sleep(200)
      }
      val port = thrift.getPortNumber

      val url = s"jdbc:hive2://localhost:$port/default"
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      var conn: java.sql.Connection = null
      while (conn == null) {
        try conn = DriverManager.getConnection(url, "anonymous", "")
        catch {
          case e: java.sql.SQLException =>
            if (System.nanoTime() > deadline) throw e
            Thread.sleep(500)
        }
      }
      conn.close()

      val ctx = new EngineContext(spark)
      ctx.createTableJdbc("region_hive", url, "graft_jdbc_region",
        Map("driver" -> "org.apache.hive.jdbc.HiveDriver"))
      ctx.createTable("nation_pq2", s"${TestSpark.sfDir}/nation.parquet", "parquet")

      // values prove the dialect: with default double-quote quoting HiveQL
      // would return the literal 'r_label' in every row
      val out = ctx.sql(
        """SELECT d.r_label, count(*) AS n_nations
          |FROM nation_pq2 n JOIN region_hive d ON n.n_regionkey = d.r_regionkey
          |GROUP BY d.r_label ORDER BY d.r_label""".stripMargin).collect()
      assert(out.length == 5)
      assert(out.map(_.getLong(1)).sum == 25)
      assert(out.map(_.getString(0)).toSeq == (0 to 4).map(i => s"REGION_$i"))

      val df = ctx.sql("SELECT r_label FROM region_hive WHERE r_regionkey > 2")
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("PushedFilters"), physical)
      assert(df.collect().map(_.getString(0)).toSet == Set("REGION_3", "REGION_4"))
    } finally {
      server.stop()
      spark.sql("DROP TABLE IF EXISTS graft_jdbc_region")
    }
  }
}
