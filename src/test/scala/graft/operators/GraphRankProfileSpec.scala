package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** GraphRank (integer PageRank), paragraph keep-first dedup, and the
  * column profiler: model-checked semantics on corpora small enough to
  * verify by hand or against an independent in-memory reference. */
class GraphRankProfileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // Independent single-threaded model of the EXACT recurrence pageRank
  // distributes: same scaled-integer floor divisions, same dangling rule.
  private def modelRank(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = GraphRank.Scale / verts.size
    var r = verts.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val s = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (u, _, w) => (r(u) / deg(u)) * w }.sum
      }
      r = verts.map(v => v -> (15 * base + 85 * s.getOrElse(v, 0L)) / 100).toMap
    }
    r
  }

  test("pageRank matches the integer model on a graph with a dangling sink") {
    import spark.implicits._
    // 1→2 (×2), 2→1, 1→3, 2→3; 3 dangles (no out-edges).
    val edges = Seq((1L, 2L, 2L), (2L, 1L, 1L), (1L, 3L, 1L), (2L, 3L, 1L))
    val got = GraphRank.pageRank(edges.toDF("src", "dst", "w"), 5)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(got === modelRank(edges, 5))
    assert(GraphRank.lastRounds === 5)
  }

  test("pageRank: a hub receiving every edge outranks its spokes") {
    import spark.implicits._
    val edges = (1L to 20L).map(i => (i, 100L, 1L)) ++ Seq((100L, 1L, 1L))
    val r = GraphRank.pageRank(edges.toDF("src", "dst", "w"), 5)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r(100L) > r(1L))
    assert((2L to 20L).forall(i => r(100L) > r(i)))
    assert(r === modelRank(edges, 5))
  }

  test("transitionEdges is the consecutive-pair graph, self-loops dropped") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 2L, 30L), (1L, 3L, 40L), // u1: 1→2, 2→2(drop), 2→3
      (2L, 3L, 10L), (2L, 1L, 20L) // u2: 3→1
    ).toDF("user_id", "item", "ts_ord")
    val e = GraphRank.transitionEdges(ev, "item", "user_id", Seq("ts_ord"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(e === Set((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)))
  }

  test("triangleCounts: K4 has 4 triangles with every corner in 3; squares have none") {
    import spark.implicits._
    // K4 on {1,2,3,4} (each edge once, arbitrary direction/duplicates),
    // plus a 4-cycle {10,11,12,13} (no triangles), plus a dangling edge.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 2L), (3L, 4L), (2L, 1L))
    val square = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val edges = (k4 ++ square ++ Seq((20L, 21L)))
      .toDF("src", "dst").withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val got = GraphRank.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: star + one chord yields exactly one triangle despite hub skew") {
    import spark.implicits._
    // hub 0 connected to 1..40 (degree-41 skew magnet) + chord (1,2):
    // the only triangle is (0,1,2); counted once, credited to all three.
    val edges = ((1L to 40L).map(i => (0L, i)) ++ Seq((1L, 2L)))
      .toDF("src", "dst")
    val got = GraphRank.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("paragraph keep-first dedup keeps exactly the first occurrence, corpus-wide and intra-doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha. beta. gamma"),
      (2L, "beta. delta"),
      (3L, "alpha. zeta. beta"),
      (4L, "alpha. beta"), // fully duplicated → empty
      (5L, "eta. eta. theta") // intra-doc duplicate
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphsKeepFirst(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("alpha. beta. gamma", 3L)))
    assert(out(2L) === (("delta", 1L)))
    assert(out(3L) === (("zeta", 1L)))
    assert(out(4L) === (("", 0L)))
    assert(out(5L) === (("eta. theta", 2L)))
  }

  test("paragraph dedup preserves within-doc order of survivors") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x. q"),
      (2L, "a. x. b. q. c")).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphsKeepFirst(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(2L) === "a. b. c")
  }

  test("columnProfile reports exact nulls, cardinality, and native-typed min/max") {
    import spark.implicits._
    val df = Seq(
      (Some(10L), Some("b")), (Some(2L), None), (None, Some("a")), (Some(10L), Some("a"))
    ).toDF("num", "s")
    val rows = Profile.columnProfile(df, Seq("num", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val num = rows("num")
    assert(num.getLong(1) === 4L) // n_rows
    assert(num.getLong(2) === 1L) // n_null
    assert(num.getLong(3) === 2L) // n_distinct
    // native numeric min/max (2 < 10 numerically; "10" < "2" lexically)
    assert(num.getString(4) === "2" && num.getString(5) === "10")
    val sc = rows("s")
    assert(sc.getLong(2) === 1L && sc.getLong(3) === 2L)
    assert(sc.getString(4) === "a" && sc.getString(5) === "b")
  }

  test("columnProfile approxDistinct: no Expand, every non-distinct column bit-identical") {
    import spark.implicits._
    val df = (0 until 500)
      .map(i => (i.toLong % 37, s"v${i % 11}", if (i % 5 == 0) null else s"w$i"))
      .toDF("num", "cat", "sparse")
    val cols = Seq("num", "cat", "sparse")
    val exact = Profile.columnProfile(df, cols)
    val approx = Profile.columnProfile(df, cols, approxDistinct = true)
    // the approx path swaps ONLY n_distinct: every other report column
    // must be bit-identical (it is the same aggregate minus the Expand)
    val drop = (d: org.apache.spark.sql.DataFrame) =>
      d.drop("n_distinct").orderBy("col_name").collect().toSeq
    assert(drop(exact) === drop(approx))
    // n_distinct is the one approximated column — HLL default rsd is 5%,
    // so pin it within 10% of exact rather than bit-equal
    val nd = (d: org.apache.spark.sql.DataFrame) => d.orderBy("col_name")
      .collect().map(_.getLong(3)).toSeq
    nd(approx).zip(nd(exact)).foreach { case (a, e) =>
      assert(math.abs(a - e) <= math.max(1L, e / 10), s"approx $a vs exact $e") }
    // structural: exact pays the Expand (C+1 row blowup); approx must not
    val pExact = exact.queryExecution.executedPlan.toString
    val pApprox = approx.queryExecution.executedPlan.toString
    assert(pExact.contains("Expand"), pExact.take(2000))
    assert(!pApprox.contains("Expand"), pApprox.take(2000))
    // and quoted/backticked names are rejected, not silently mislabeled
    intercept[IllegalArgumentException] {
      Profile.columnProfile(df.withColumnRenamed("num", "a`b"), Seq("a`b"))
    }
  }

  test("labelPropagation: two triangles over a weak bridge settle into two communities") {
    import spark.implicits._
    // triangle {1,2,3} and triangle {10,11,12}, bridged 3—10 with weight 1
    val edges = Seq(
      (1L, 2L, 5L), (2L, 3L, 5L), (1L, 3L, 5L),
      (10L, 11L, 5L), (11L, 12L, 5L), (10L, 12L, 5L),
      (3L, 10L, 1L)).toDF("src", "dst", "w")
    val out = GraphRank.labelPropagation(edges, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 3L).map(out) === Set(1L))
    assert(Set(10L, 11L, 12L).map(out) === Set(10L))
  }

  test("labelPropagation is deterministic under vote ties (smallest label wins)") {
    import spark.implicits._
    // vertex 5 sees equal-weight votes from 1 and 9 — must adopt 1
    val edges = Seq((1L, 5L, 3L), (9L, 5L, 3L)).toDF("src", "dst", "w")
    val r1 = GraphRank.labelPropagation(edges, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(5L) === 1L)
  }

  test("transitivityAudit: K4 closes every wedge; a path closes none; NULL when wedge-free") {
    import spark.implicits._
    // K4: 6 edges, 12 wedges, 4 triangles → transitivity 1.0
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("id_a", "id_b")
    val a = GraphRank.transitivityAudit(k4).collect()(0)
    assert((a.getLong(0), a.getLong(1), a.getLong(2)) === ((6L, 12L, 4L)))
    assert(a.getDouble(3) === 1.0)
    // path 1-2-3: one wedge, no triangle → 0.0
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val p = GraphRank.transitivityAudit(path).collect()(0)
    assert((p.getLong(1), p.getLong(2), p.getDouble(3)) === ((1L, 0L, 0.0)))
    // a single edge has no wedge → transitivity NULL, not 0/0
    val e1 = Seq((7L, 8L)).toDF("id_a", "id_b")
    val s = GraphRank.transitivityAudit(e1).collect()(0)
    assert(s.getLong(1) === 0L && s.isNullAt(3))
  }
}
