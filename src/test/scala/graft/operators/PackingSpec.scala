package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Sequence packing + √-temperature mixture sampling properties. The
  * cross-engine value parity is pinned by the q74/q75 DuckDB oracles;
  * these specs pin the operator INVARIANTS: offset contiguity per shard,
  * chunk-span arithmetic, summary consistency, and that the sampling
  * helper is exactly the rate-filter composition the oracle replays.
  */
class PackingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // uneven doc lengths incl. budget-straddlers and an over-budget doc
  private def docs = (0L until 300L)
    .map(i => (i, s"shard${i % 3}", ("tok " * (1 + (i * 37 % 120)).toInt).trim))
    .toDF("id", "shard", "text")

  test("assignChunks: offsets are contiguous within each shard") {
    val assigned = Packing.assignChunks(docs, col("shard"), col("id"),
      TextAnalysis.wsTokenCount(col("text")), 64)
      .select("shard", "id", "n_tokens", "start_off", "chunk_first", "chunk_last")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(assigned.length == 300)
    for ((shard, rows) <- assigned.groupBy(_._1)) {
      val ordered = rows.sortBy(_._2)
      // doc k+1 starts exactly where doc k ended — no gaps, no overlap
      ordered.sliding(2).foreach {
        case Array((_, _, n, off, _, _), (_, _, _, off2, _, _)) =>
          assert(off2 == off + n, s"$shard: offset gap at $off")
        case _ =>
      }
      assert(ordered.head._4 == 0L, s"$shard must start at offset 0")
      // chunk span matches the offset arithmetic for every row
      ordered.foreach { case (_, id, n, off, first, last) =>
        assert(first == off / 64, s"doc $id chunk_first")
        assert(last == (off + n - 1) / 64, s"doc $id chunk_last")
        assert(last >= first)
        // an over-budget doc spans > 1 chunk; a 1-token doc spans exactly 1
        if (n > 64) assert(last > first, s"doc $id with $n tokens must straddle")
      }
    }
  }

  test("chunkSummary conserves docs and tokens") {
    val assigned = Packing.assignChunks(docs, col("shard"), col("id"),
      TextAnalysis.wsTokenCount(col("text")), 64)
    val summary = Packing.chunkSummary(assigned, col("shard"))
    val (nDocs, nTokens) = summary
      .agg(sum("n_docs_start"), sum("tokens_started")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).head
    assert(nDocs == 300)
    val totalTokens = assigned.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(nTokens == totalTokens)
    // straddle flag: a chunk is marked iff some doc starting there spills out
    val marked = summary.filter(col("straddles_out") === 1).count()
    val straddlers = assigned.filter(col("chunk_last") > col("chunk_first"))
      .select("shard", "chunk_first").distinct().count()
    assert(marked == straddlers)
  }

  test("emitChunks: every non-terminal chunk holds exactly the budget") {
    val emitted = Packing.emitChunks(docs, col("shard"), col("id"), col("text"), 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    for ((shard, rows) <- emitted.groupBy(_._1)) {
      val ordered = rows.sortBy(_._2)
      // chunk ids are dense from 0
      assert(ordered.map(_._2).toSeq == (0L until ordered.length).toSeq, s"$shard gaps")
      // all but the last chunk are exactly budget-full; the tail holds the rest
      ordered.init.foreach { case (_, c, _, n, _) => assert(n == 64L, s"$shard chunk $c") }
      assert(ordered.last._4 <= 64L && ordered.last._4 > 0L)
    }
    // token conservation across the emission
    val total = docs.select(TextAnalysis.wsTokenCount(col("text")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(emitted.map(_._4).sum == total)
    // md5s are deterministic across a rerun (ordering inside chunks is total)
    val again = Packing.emitChunks(docs, col("shard"), col("id"), col("text"), 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(4))).toSet
    assert(again == emitted.map(t => (t._1, t._2, t._5)).toSet)
  }

  test("sqrtTemperatureRates: largest stratum keeps everything, smaller keep sqrt-scaled") {
    // strata of 320 / 80 / 20 rows: rates 10000 / 5000 / 2500
    val skewed = ((0 until 320).map(i => (i.toLong, "big")) ++
      (0 until 80).map(i => (1000L + i, "mid")) ++
      (0 until 20).map(i => (2000L + i, "small"))).toDF("id", "src")
    val rates = Sampling.sqrtTemperatureRates(skewed, col("src"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rates("big") == 10000L)
    assert(rates("mid") == 5000L)    // floor(10000*sqrt(80/320))
    assert(rates("small") == 2500L)  // floor(10000*sqrt(20/320))
  }

  test("sqrtTemperatureSample is exactly the rate filter (and deterministic)") {
    // skewed strata so sub-10000 rates actually drop rows
    val skewed = ((0 until 320).map(i => (i.toLong, "big")) ++
      (0 until 80).map(i => (1000L + i, "mid")) ++
      (0 until 20).map(i => (2000L + i, "small")))
      .map { case (id, src) => (id, src, s"text body $id") }.toDF("id", "shard", "text")
    val withBucket = skewed.withColumn("b",
      Sampling.splitBucket(concat(col("text"), col("id"))))
    val rates = Sampling.sqrtTemperatureRates(skewed, col("shard"))
      .withColumnRenamed("stratum", "shard")
    val expected = withBucket.join(rates, "shard")
      .filter(col("b") < col("rate_per10k"))
      .select("id").collect().map(_.getLong(0)).toSet
    val sampled = Sampling.sqrtTemperatureSample(skewed, col("shard"),
      concat(col("text"), col("id")))
    assert(sampled.columns.toSeq == Seq("id", "shard", "text")) // helpers dropped
    val got = sampled.select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // big keeps all 320 (rate 10000); mid/small drop some at rates 5000/2500
    assert(got.count(_ < 1000L) == 320)
    assert(got.size < 420)
    // rerun is bit-identical (content-keyed membership)
    val again = Sampling.sqrtTemperatureSample(skewed, col("shard"),
      concat(col("text"), col("id"))).select("id").collect().map(_.getLong(0)).toSet
    assert(again == got)
  }
}
