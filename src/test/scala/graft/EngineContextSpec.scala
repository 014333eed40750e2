package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class EngineContextSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def ctx = EngineContext.forDir(spark, TestSpark.sfDir)

  test("createTable registers parquet tables and sql() queries them") {
    val c = ctx
    val df = c.sql("SELECT count(*) AS n FROM lineitem")
    assert(df.collect()(0).getLong(0) == 6000)
  }

  test("catalog: listTables / describeTable / dropTable") {
    val c = ctx
    assert(c.listTables().contains("lineitem"))
    val cols = c.describeTable("region").map(_._1)
    assert(cols == Seq("r_regionkey", "r_name"))
    c.createTable("tmp_t", c.sql("SELECT 1 AS x"))
    assert(c.listTables().contains("tmp_t"))
    c.dropTable("tmp_t")
    assert(!c.listTables().contains("tmp_t"))
  }

  test("createTable infers format from extension: csv and json round-trip") {
    val c = ctx
    val dir = Files.createTempDirectory("graft_src").toFile
    val src = spark.table("region")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/r_csv")
    src.write.mode("overwrite").json(s"$dir/r_json")
    // directories (no extension) with explicit format
    c.createTable("r_csv", s"$dir/r_csv", "csv")
    c.createTable("r_json", s"$dir/r_json", "json")
    assert(c.sql("SELECT count(*) AS n FROM r_csv").collect()(0).getLong(0) == 5)
    assert(c.sql("SELECT count(*) AS n FROM r_json").collect()(0).getLong(0) == 5)
    // orc too (reference io formats: DataType.h parquet/orc/csv/json)
    src.write.mode("overwrite").orc(s"$dir/r_orc")
    c.createTable("r_orc", s"$dir/r_orc", "orc")
    assert(c.sql("SELECT count(*) AS n FROM r_orc").collect()(0).getLong(0) == 5)
  }

  test("explain emits Calcite-shaped algebra; detail=true returns physical plan") {
    val c = ctx
    // pushed filter+projection folds into BindableTableScan, as the
    // reference's ProjectTableScanRule/FilterTableScanRule produce
    val scan = c.explain("SELECT r_name FROM region WHERE r_regionkey > 1")
    assert(scan == "BindableTableScan(table=[[main, region]], " +
      "filters=[[>($0, 1)]], projects=[[1]], aliases=[[r_name]])")
    // the reference docs' UNION example shape (context.py:1842-1924):
    // LogicalUnion over one clean scan and one filtered BindableTableScan
    val union = c.explain(
      "SELECT r_regionkey, r_name FROM region UNION ALL " +
      "SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 3")
    val uLines = union.split("\n")
    assert(uLines(0) == "LogicalUnion(all=[true])")
    assert(uLines(1) == "  LogicalTableScan(table=[[main, region]])")
    assert(uLines(2).startsWith("  BindableTableScan(table=[[main, region]], filters=[[<($0, 3)]]"))
    // agg + sort nest with two-space indentation per level
    val agg = c.explain(
      "SELECT o_orderstatus, count(*) AS n FROM orders " +
      "GROUP BY o_orderstatus ORDER BY o_orderstatus")
    val aLines = agg.split("\n")
    // engine ORDER BY default is nulls-first; Calcite spells the
    // deviation from its own default explicitly, as the reference does
    assert(aLines(0).startsWith("LogicalSort(sort0=[$0], dir0=[ASC-nulls-first]"))
    assert(aLines(1).startsWith("  LogicalAggregate(group=[{0}], n=[COUNT()]"))
    assert(aLines(2).startsWith("    "))
    // join renders condition + joinType
    val join = c.explain(
      "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey")
    assert(join.contains("LogicalJoin(condition=[=(") && join.contains("joinType=[inner]"))
    val physical = c.explain("SELECT r_name FROM region WHERE r_regionkey > 1", detail = true)
    assert(physical.contains("FileScan") || physical.contains("Scan"))
  }

  test("async token API: sqlAsync/status/fetch") {
    val c = ctx
    val token = c.sqlAsync("SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus")
    val df = c.fetch(token) // blocks until done
    assert(df.count() == 3)
    assert(c.status(token) == "unknown") // consumed
    c.release(token)
  }

  test("async result lifecycle: release(token) drops the cached result") {
    val c = ctx
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val token = c.sqlAsync("SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey")
    val df = c.fetch(token)
    // fetched result is served from cache until released
    assert(df.storageLevel.useMemory)
    c.release(token)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "async result blocks must not outlive release(token)")
    c.release(token) // idempotent
    // cancel() of a pending token evicts it the same way
    val t2 = c.sqlAsync("SELECT count(*) FROM lineitem")
    c.cancel(t2)
    assert(c.status(t2) == "unknown")
  }

  test("parallel async queries with mixed fetch/cancel leave no storage residue") {
    val c = ctx
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val tokens = (0 until 6).map { i =>
      // distinct SQL per token: identical text would share one cache entry
      c.sqlAsync(s"SELECT o_custkey + $i AS k, count(*) AS n FROM orders GROUP BY o_custkey + $i")
    }
    // cancel half immediately (racing the analysis phase on purpose —
    // the released-flag handoff must prevent orphaned caches), fetch the rest
    tokens.zipWithIndex.foreach { case (t, i) =>
      if (i % 2 == 0) c.cancel(t) else c.fetch(t)
    }
    tokens.foreach(c.release)
    // racing cancels self-unpersist when their Future completes — poll
    val deadline = System.currentTimeMillis + 20000
    def residue = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (System.currentTimeMillis < deadline && residue.nonEmpty) Thread.sleep(100)
    assert(residue.isEmpty, s"async storage residue: $residue")
    assert(tokens.forall(c.progressDetail(_).isEmpty))
  }

  test("async progress detail: per-stage rows/bytes, evicted on release") {
    val c = ctx
    // distinct SQL text: an identical string to another test's query would
    // share the cache-manager entry and perturb that test's logged plan
    val token = c.sqlAsync(
      "SELECT o_orderpriority, count(*) AS n_det FROM orders GROUP BY o_orderpriority")
    try {
      c.fetch(token)
      // stage-completed (and skipped-stage retirement at job end) arrive on
      // the async listener bus — poll until the detail settles
      val deadline = System.currentTimeMillis + 15000
      def detail = c.progressDetail(token)
      while (System.currentTimeMillis < deadline &&
        !(detail.nonEmpty && detail.forall(_.completed))) Thread.sleep(100)
      val d = detail
      assert(d.nonEmpty && d.forall(_.completed),
        s"AQE-skipped stages must be retired, live ones completed: $d")
      assert(d.map(_.inputRows).sum > 0, "the scan stage must report rows read")
      assert(d.map(_.inputBytes).sum > 0)
      assert(d.map(_.shuffleWriteBytes).sum > 0, "a groupBy job must have a map-side shuffle write")
    } finally c.release(token)
    assert(c.progressDetail(token).isEmpty, "progress detail must not outlive the token")
  }

  test("csv reference kwargs: names/dtype/delimiter") {
    val c = ctx
    val dir = Files.createTempDirectory("graft_csv").toFile
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"), "1|alpha|1.5\n2|beta|2.5\n")
    c.createTable("kw_csv", s"$dir/data.csv", "csv", Map(
      "names" -> "id,name,score", "dtype" -> "BIGINT,STRING,DOUBLE", "delimiter" -> "|"))
    val rows = c.sql("SELECT id, name, score FROM kw_csv ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).sameElements(Array(1L, 2L)))
    assert(rows(1).getString(1) == "beta" && rows(1).getDouble(2) == 2.5)
  }

  test("csv reference kwargs: skiprows/nrows/quotechar/comment/na_values") {
    val c = ctx
    val dir = Files.createTempDirectory("graft_csv2").toFile
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"),
      """junk preamble line 1
        |junk preamble line 2
        |# a comment line
        |1,"alpha, quoted",NA
        |2,beta,9.5
        |3,gamma,1.25
        |4,delta,NA
        |""".stripMargin)
    c.createTable("kw_csv2", s"$dir/data.csv", "csv", Map(
      "names" -> "id,name,score", "dtype" -> "BIGINT,STRING,DOUBLE",
      "skiprows" -> "2", "comment" -> "#", "quotechar" -> "\"",
      "na_values" -> "NA", "nrows" -> "3"))
    val rows = c.sql("SELECT id, name, score FROM kw_csv2 ORDER BY id").collect()
    assert(rows.length == 3) // nrows cap: 4th data row dropped
    assert(rows(0).getString(1) == "alpha, quoted") // quotechar honored
    assert(rows(0).isNullAt(2)) // na_values -> null
    assert(rows(1).getDouble(2) == 9.5)
  }

  test("csv max_bytes_chunk_read bounds the per-task split size") {
    val c = ctx
    val dir = Files.createTempDirectory("graft_chunk").toFile
    // ~64 KB of CSV lines in one file
    val sb = new StringBuilder
    (1 to 4000).foreach(i => sb.append(i).append(",payload_payload_")
      .append(i % 7).append("\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/big.csv"), sb.toString)
    // default read: one small file -> one split
    c.createTable("chunk_off", s"$dir/big.csv", "csv",
      Map("names" -> "id,tag", "dtype" -> "BIGINT,STRING"))
    assert(spark.table("chunk_off").rdd.getNumPartitions == 1)
    // 8 KB chunks -> ~8 splits, per-TABLE (session conf untouched)
    val sessionDefault = spark.conf.get("spark.sql.files.maxPartitionBytes")
    c.createTable("chunk_on", s"$dir/big.csv", "csv",
      Map("names" -> "id,tag", "dtype" -> "BIGINT,STRING",
        "max_bytes_chunk_read" -> "8192"))
    val parts = spark.table("chunk_on").rdd.getNumPartitions
    assert(parts >= 4, s"chunked read produced only $parts partitions")
    assert(spark.conf.get("spark.sql.files.maxPartitionBytes") == sessionDefault)
    // values unaffected by the split boundaries
    assert(c.sql("SELECT sum(id) AS s FROM chunk_on").collect()(0).getLong(0) ==
      4000L * 4001 / 2)
  }

  test("hive-partitioned directory: partition column discovered and pruned") {
    val c = ctx
    val dir = Files.createTempDirectory("graft_part").toFile
    spark.table("orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(s"$dir/orders_part")
    c.createTable("orders_part", s"$dir/orders_part", "parquet")
    // partition column round-trips
    val statuses = c.sql("SELECT DISTINCT o_orderstatus FROM orders_part")
      .collect().map(_.getString(0)).sorted
    assert(statuses.sameElements(Array("F", "O", "P")))
    // partition pruning: filter must land in PartitionFilters, not the scan
    val plan = c.explain("SELECT count(*) FROM orders_part WHERE o_orderstatus = 'F'", detail = true)
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus") ||
      plan.contains("o_orderstatus#") && plan.contains("PartitionFilters"))
    val n = c.sql("SELECT count(*) AS n FROM orders_part WHERE o_orderstatus = 'F'")
      .collect()(0).getLong(0)
    assert(n == spark.table("orders").where("o_orderstatus = 'F'").count())
  }

  test("filesystem registration: localfs alias resolves, s3/gs/hdfs map conf") {
    val c = ctx
    // localfs: a registered alias actually reads through file://
    val dir = Files.createTempDirectory("graft_fs").toFile.getAbsolutePath
    spark.table("region").write.mode("overwrite").parquet(s"$dir/r")
    c.localfs("myfs", dir)
    c.createTable("r_fs", "myfs://r", "parquet")
    assert(c.sql("SELECT count(*) AS n FROM r_fs").collect()(0).getLong(0) == 5)
    // s3/gs/hdfs: alias mapping + hadoop conf keys (no cloud in sandbox)
    c.s3("warehouse", "my-bucket", Map(
      "access_key_id" -> "AKIATEST", "secret_key" -> "sk", "endpoint_override" -> "http://minio:9000"))
    c.gs("lake", "proj-1", "gcs-bucket")
    c.hdfs("cluster", "namenode", 8020, "hdfs")
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.access.key") == "AKIATEST")
    assert(hc.get("fs.s3a.endpoint") == "http://minio:9000")
    assert(hc.get("fs.gs.project.id") == "proj-1")
    assert(c.listFilesystems() == Map(
      "myfs" -> s"file://$dir", "warehouse" -> "s3a://my-bucket",
      "lake" -> "gs://gcs-bucket", "cluster" -> "hdfs://namenode:8020"))
  }

  test("progress reports task completion for async queries") {
    val c = ctx
    val token = c.sqlAsync(
      "SELECT o_orderstatus, count(*) FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1")
    val p = c.progress(token)
    assert(p >= 0.0 && p <= 1.0) // running or already done, never unknown
    c.fetch(token)
    assert(c.progress(token) == -1.0) // consumed
    assert(c.progress("no-such-token") == -1.0)
  }

  test("createTable accepts a list of paths and glob patterns") {
    val c = ctx
    val dir = Files.createTempDirectory("graft_multi").toFile.getAbsolutePath
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/part1.csv"), "1,a\n2,b\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/part2.csv"), "3,c\n4,d\n")
    c.createTable("multi_csv", Seq(s"$dir/part1.csv", s"$dir/part2.csv"), "csv",
      Map("names" -> "id,tag", "dtype" -> "BIGINT,STRING"))
    assert(c.sql("SELECT count(*) AS n FROM multi_csv").collect()(0).getLong(0) == 4)
    assert(c.sql("SELECT sum(id) AS s FROM multi_csv").collect()(0).getLong(0) == 10)
    // glob: Spark resolves wildcards natively
    c.createTable("glob_csv", s"$dir/part*.csv", "csv",
      Map("names" -> "id,tag", "dtype" -> "BIGINT,STRING"))
    assert(c.sql("SELECT count(*) AS n FROM glob_csv").collect()(0).getLong(0) == 4)
  }

  test("write surface: CTAS through sql() and partitioned saveTable round-trip") {
    val c = ctx
    val dir = Files.createTempDirectory("graft_write").toFile.getAbsolutePath
    // CTAS lands in the session catalog at an explicit location
    spark.sql("DROP TABLE IF EXISTS big_orders")
    c.sql(
      s"""CREATE TABLE big_orders USING parquet LOCATION '$dir/big_orders' AS
         |SELECT * FROM orders WHERE o_totalprice > 100000""".stripMargin)
    val expected = spark.table("orders").where("o_totalprice > 100000").count()
    assert(c.sql("SELECT count(*) AS n FROM big_orders").collect()(0).getLong(0) == expected)
    spark.sql("DROP TABLE IF EXISTS big_orders")
    // partitioned write + re-register: partition column survives and prunes
    c.saveTable("orders", s"$dir/orders_by_status", partitionBy = Seq("o_orderstatus"))
    c.createTable("orders_by_status", s"$dir/orders_by_status", "parquet")
    val plan = c.explain(
      "SELECT count(*) FROM orders_by_status WHERE o_orderstatus = 'F'", detail = true)
    assert(plan.contains("PartitionFilters"), plan.take(1500))
    assert(c.sql("SELECT count(*) AS n FROM orders_by_status").collect()(0).getLong(0) ==
      spark.table("orders").count())
  }

  test("memory API: free/max-used/reset report per-executor bytes") {
    val c = ctx
    val free = c.getFreeMemory()
    assert(free.nonEmpty && free.values.forall(_ > 0))
    c.sql("SELECT count(*) FROM lineitem").collect()
    val used = c.getMaxMemoryUsed()
    assert(used.keySet == free.keySet && used.values.forall(_ >= 0))
    c.resetMaxMemoryUsed()
    assert(c.getMaxMemoryUsed().values.forall(_ >= 0)) // repopulated snapshot
  }

  test("partitionTable repartitions a registered table by columns") {
    val c = ctx
    c.createTable("orders_rp", c.sql("SELECT * FROM orders"))
    val out = c.partitionTable("orders_rp", Seq("o_custkey"), 8)
    assert(out.rdd.getNumPartitions == 8)
    val plan = spark.table("orders_rp").queryExecution.optimizedPlan.toString
    assert(plan.contains("RepartitionByExpression") || plan.contains("hashpartitioning"), plan)
    assert(c.sql("SELECT count(*) AS n FROM orders_rp").collect()(0).getLong(0) ==
      spark.table("orders").count())
  }

  test("query log records completed actions as a queryable table") {
    val c = ctx
    c.queryLog.clear()
    c.sql("SELECT count(*) AS n FROM region").collect()
    // QueryExecutionListener events arrive on the async listener bus
    var rows = Array.empty[org.apache.spark.sql.Row]
    val deadline = System.currentTimeMillis() + 10000
    while (rows.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      rows = c.log("graft_log").collect()
    }
    assert(spark.table("graft_log").columns.contains("duration_ms"))
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("status") == "success"))
  }

  test("logDedupRecommendation: probe WHY fields land as a note row next to the run (r15 verdict #5)") {
    val c = ctx
    c.queryLog.clear()
    // the recommendation the pipeline was HANDED — per-call attribution,
    // not the JVM-global last-writer-wins register
    val rec = operators.Dedup.DedupProfileRecommendation(
      profile = "token", maxBucket = 0L, sampleDocs = 2048L,
      nonAsciiChars = 12L, totalChars = 123585L,
      distinctGrams = 377L, halfSeenGrams = 377L, estPairs = 93L)
    assert(c.logDedupRecommendation(rec) eq rec, "returns its argument for chaining")
    // annotations are synchronous (no listener bus hop)
    val notes = c.log().filter("status = 'note' AND func = 'dedup.recommendProfile'")
      .collect()
    assert(notes.length == 1)
    val detail = notes(0).getAs[String]("plan_head")
    assert(detail.contains("profile=token") && detail.contains("maxBucket=0"))
    assert(detail.contains("newGramRate=0.0000"),
      s"fully-covered half ⇒ newGramRate 0, got: $detail")
    assert(detail.contains("estPairs=93"))
    assert(notes(0).getAs[Long]("rows") == 2048L, "rows column carries the probed sample size")
  }

  test("query log records output row counts from executed-plan metrics") {
    val c = ctx
    c.queryLog // install listener before the query runs
    c.queryLog.clear()
    // 3 order statuses -> the logged collect must carry rows = 3. The
    // polling collects below get logged too, so match our entry by its
    // aggregate plan head.
    c.sql("SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus").collect()
    var logged = Seq.empty[Long]
    val deadline = System.currentTimeMillis() + 10000
    while (!logged.contains(3L) && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      logged = c.log().collect()
        .filter(_.getAs[String]("plan_head").contains("Aggregate"))
        .map(_.getAs[Long]("rows")).toSeq
    }
    assert(logged.contains(3L),
      s"expected an entry with rows=3 (reference log tables carry per-query row counts), got $logged")
  }

  test("per-query config_options bind the plan and restore the session") {
    val c = ctx
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val df = c.sql(
      "SELECT count(*) FROM nation JOIN region ON n_regionkey = r_regionkey",
      Map("MAX_JOIN_SCATTER_MEM_OVERHEAD" -> "-1"))
    // broadcast disabled for THIS query only
    assert(!df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before)
    // and a normal query still broadcasts the tiny dim
    val normal = c.sql("SELECT count(*) FROM nation JOIN region ON n_regionkey = r_regionkey")
    assert(normal.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("per-query config_options reach AQE-runtime knobs on the cloned session") {
    val c = ctx
    val q = "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey"
    // default session: AQE coalesces this small shuffle to few partitions
    val coalesced = c.sql(q)
    coalesced.collect()
    val defaultParts = coalesced.rdd.getNumPartitions
    assert(defaultParts < 32)
    // coalescing is read by AQE at RUNTIME, after planning — the round-4
    // set/plan/restore implementation silently dropped this override
    val df = c.sql(q, Map("spark.sql.adaptive.coalescePartitions.enabled" -> "false"))
    df.collect()
    assert(df.rdd.getNumPartitions == 32) // session shuffle.partitions
    // parent session conf untouched (no restore step needed at all)
    assert(spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    val again = c.sql(q)
    again.collect()
    assert(again.rdd.getNumPartitions == defaultParts)
  }

  test("hdfs registration maps kerberos ticket onto hadoop security confs") {
    val c = ctx
    c.hdfs("kerbfs", "namenode.example", 8020, user = "etl",
      kerbTicket = "/tmp/krb5cc_1000")
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("hadoop.security.authentication") == "kerberos")
    assert(hc.get("hadoop.security.kerberos.ticket.cache.path") == "/tmp/krb5cc_1000")
    assert(hc.get("hadoop.user.name") == "etl")
    assert(c.listFilesystems()("kerbfs") == "hdfs://namenode.example:8020")
  }

  test("config maps reference keys onto spark conf") {
    val c = ctx
    c.config("MAX_JOIN_SCATTER_MEM_OVERHEAD", "500000000")
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "500000000")
    c.config(Map("EXECUTOR_THREADS" -> "32"))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "32")
  }
}
