package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

/**
  * RDBMS source proof (reference: engine/src/io/data_provider/sql/
  * SQLiteDataProvider.cpp and MySQLDataProvider.cpp register SQL table
  * providers; predicate pushdown via io/data_parser/sql/SQLTranspiler.cpp).
  * The sandbox has no external DB, so this uses Derby embedded (in-JVM,
  * ships with Spark) — the same JDBC path a user would point at
  * mysql/postgresql/sqlite URLs.
  */
class JdbcSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        try st.executeUpdate("DROP TABLE region_dim") catch { case _: java.sql.SQLException => () }
        st.executeUpdate("CREATE TABLE region_dim (r_regionkey INT NOT NULL, r_label VARCHAR(32))")
        Seq(0 -> "AFRICA", 1 -> "AMERICA", 2 -> "ASIA", 3 -> "EUROPE", 4 -> "MIDDLE EAST")
          .foreach { case (k, v) => st.executeUpdate(s"INSERT INTO region_dim VALUES ($k, '$v')") }
      } finally st.close()
    } finally conn.close()
  }

  test("createTableJdbc joins a JDBC table to a parquet table with correct results") {
    seed()
    val ctx = new EngineContext(spark)
    ctx.createTableJdbc("region_dim", url, "region_dim",
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    ctx.createTable("nation_pq", s"${TestSpark.sfDir}/nation.parquet", "parquet")
    val out = ctx.sql(
      """SELECT d.r_label, count(*) AS n_nations
        |FROM nation_pq n JOIN region_dim d ON n.n_regionkey = d.r_regionkey
        |GROUP BY d.r_label ORDER BY d.r_label""".stripMargin).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(1)).sum == 25) // 25 nations, every region covered
    assert(out.map(_.getString(0)).toSeq == Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))
  }

  test("filters push down into the JDBC scan") {
    seed()
    val ctx = new EngineContext(spark)
    ctx.createTableJdbc("region_dim", url, "region_dim",
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    val df = ctx.sql("SELECT r_label FROM region_dim WHERE r_regionkey > 2")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters"), physical)
    assert(physical.contains("GreaterThan(R_REGIONKEY,2)") ||
      physical.contains("R_REGIONKEY > 2"), physical)
    assert(df.collect().map(_.getString(0)).toSet == Set("EUROPE", "MIDDLE EAST"))
  }
}
