package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Deterministic sampling/splits and the round-6 text-curation columns
  * (repetition metrics, PII scrub). The cross-engine value parity is pinned
  * by the q67-q69 DuckDB oracles; these specs pin the operator PROPERTIES:
  * determinism, membership stability under corpus growth, split totality,
  * and redaction correctness on adversarial strings.
  */
class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs = (0L until 500L).map(i => (i, s"document number $i body")).toDF("id", "text")

  test("splitBucket is deterministic and in range") {
    val b1 = docs.select(Sampling.splitBucket(col("text")).as("b")).collect().map(_.getLong(0))
    val b2 = docs.select(Sampling.splitBucket(col("text")).as("b")).collect().map(_.getLong(0))
    assert(b1.sameElements(b2))
    assert(b1.forall(b => b >= 0 && b < 10000))
    // uniform-ish: 500 keys should hit well over 100 distinct buckets
    assert(b1.distinct.length > 100)
  }

  test("assignSplit is total and respects the 80/10/10 weights") {
    val splits = docs
      .select(Sampling.assignSplit(Sampling.splitBucket(col("text"))).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(splits.values.sum == 500)
    // binomial(500, 0.8) is within [330, 470] except with vanishing probability
    assert(splits("train") > 330 && splits("train") < 470, s"train=${splits("train")}")
  }

  test("assignSplit boundaries are exact") {
    val buckets = Seq(0L, 7999L, 8000L, 8999L, 9000L, 9999L).toDF("b")
    val splits = buckets.select(col("b"), Sampling.assignSplit(col("b")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(splits == Map(0L -> "train", 7999L -> "train", 8000L -> "val",
      8999L -> "val", 9000L -> "test", 9999L -> "test"))
  }

  test("null keys bucket deterministically as the empty string") {
    val withNull = Seq((1L, Option("doc one")), (2L, Option.empty[String]))
      .toDF("id", "text")
    val buckets = withNull.select(col("id"), Sampling.splitBucket(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val emptyBucket = Seq("").toDF("t")
      .select(Sampling.splitBucket(col("t"))).collect()(0).getLong(0)
    // null-keyed rows are assigned, not dropped — one stable bucket
    assert(buckets(2L) == emptyBucket)
    val splits = withNull.select(Sampling.assignSplit(Sampling.splitBucket(col("text"))))
      .collect().map(_.getString(0))
    assert(splits.forall(Set("train", "val", "test")))
  }

  test("hashSample membership is stable when the corpus grows") {
    val small = Sampling.hashSample(docs, col("text"), 1000)
      .select("id").collect().map(_.getLong(0)).toSet
    val grown = docs.union((500L until 1000L).map(i => (i, s"document number $i body"))
      .toDF("id", "text"))
    val big = Sampling.hashSample(grown, col("text"), 1000)
      .select("id").filter(col("id") < 500).collect().map(_.getLong(0)).toSet
    assert(small == big, "a doc's sample membership must not depend on other rows")
  }

  test("duplicate-token fraction and bigram metrics") {
    val m = Seq((1L, "a a a"), (2L, "w x y z"), (3L, "solo"))
      .toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("toks"))
      .select(col("id"),
        TextAnalysis.dupTokenFraction(col("toks")).as("dup"),
        TextAnalysis.wordBigrams(col("toks")).as("bg"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[String](2))).toMap
    assert(m(1L)._1 == 0.666667) // 3 tokens, 1 distinct
    assert(m(1L)._2 == Seq("a a", "a a"))
    assert(m(2L)._1 == 0.0)
    assert(m(2L)._2 == Seq("w x", "x y", "y z"))
    assert(m(3L)._2.isEmpty) // under 2 tokens → no bigrams, not a null row
  }

  test("topBigramFraction caps at 1.0 and nulls → 0") {
    val out = Seq((Some(2L), 3), (None, 1), (Some(9L), 4))
      .toDF("top_cnt", "n_tokens")
      .select(TextAnalysis.topBigramFraction(col("top_cnt"), col("n_tokens")).as("f"))
      .collect().map(_.getDouble(0))
    assert(out(0) == 1.0) // 2*2/3 > 1 → capped
    assert(out(1) == 0.0) // no bigrams
    assert(out(2) == 1.0)
  }

  test("stratifiedSample: exact ceil(frac·n) per stratum, deterministic membership") {
    val df = (0L until 300L).map(i => (i, s"s${i % 3}", s"text body $i")).toDF("id", "src", "text")
    def run() = Sampling.stratifiedSample(df, col("src"), concat(col("text"), col("id")), 1000)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSeq.sorted
    val a = run(); val b = run()
    assert(a == b) // same rows every run — content-keyed, not rand()
    // exactly ceil(0.1 × 100) = 10 per stratum
    assert(a.groupBy(_._1).view.mapValues(_.size).toMap == Map("s0" -> 10, "s1" -> 10, "s2" -> 10))
  }

  test("tokenGramFingerprints: empty below n tokens, distinct, order-stable") {
    val out = Seq("a b c d e f g h i", "too short", "x x x x x x x x x")
      .toDF("text")
      .select(Decontamination.tokenGramFingerprints(col("text"), 8).as("gs"))
      .collect().map(_.getSeq[String](0))
    assert(out(0).length == 2) // 9 tokens → windows at 1 and 2
    assert(out(1).isEmpty)     // 2 tokens < n → empty array, not null/error
    assert(out(2).length == 1) // both windows identical → distinct collapses
  }

  test("contaminationReport finds planted leaks; budget gate is answer-neutral") {
    val evalSet = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "prefix alpha beta gamma delta epsilon zeta eta theta iota suffix"), // leak
      (11L, "totally unrelated words that never overlap the benchmark at all ok"),
      (12L, "short"))
      .toDF("doc_id", "text")
    def run(budget: Long) =
      Decontamination.contaminationReport(corpus, evalSet, "doc_id", "text", 8, budget)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    val bc = run(Long.MaxValue)
    assert(bc == Seq((10L, 4, 2))) // 11-token leak: 4 windows, 2 match eval's grams
    assert(run(0L) == bc) // SHUFFLE_HASH fallback: identical report
  }

  test("PII redaction: emails and URLs replaced, host names otherwise intact") {
    val out = Seq(
      "mail bob.smith+tag@corp.example.com and see https://a.example.org/x_1/y today",
      "no pii here",
      "tricky: x@y.io. end") // trailing dot after TLD must not be eaten
      .toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("r"),
        TextAnalysis.patternCount(col("text"), TextAnalysis.EmailRe).as("ne"),
        TextAnalysis.patternCount(col("text"), TextAnalysis.UrlRe).as("nu"))
      .collect()
    assert(out(0).getString(0) == "mail <EMAIL> and see <URL> today")
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 1)
    assert(out(1).getString(0) == "no pii here")
    assert(out(2).getString(0) == "tricky: <EMAIL>. end")
  }

  test("waterFillBudget: exact level on a hand corpus; degenerate budgets") {
    // rows roll up per stratum: a=1, b=5, c=10 tokens
    val rows = (Seq.fill(1)("a") ++ Seq.fill(5)("b") ++ Seq.fill(10)("c"))
      .map((_, 1L)).toDF("src", "tok")
    def fill(b: Long) = Sampling.waterFillBudget(rows, col("src"), col("tok"), b)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getInt(3))).toMap
    val f12 = fill(12L)    // τ = max(⌊12/3⌋, ⌊11/2⌋, ⌊6/1⌋) = 6
    assert(f12 === Map("a" -> ((1L, 0)), "b" -> ((5L, 0)), "c" -> ((6L, 1))))
    assert(f12.values.map(_._1).sum === 12L)   // budget exactly consumed
    val all = fill(100L)   // budget ≥ total: everything kept, nothing capped
    assert(all === Map("a" -> ((1L, 0)), "b" -> ((5L, 0)), "c" -> ((10L, 0))))
    val zero = fill(0L)
    assert(zero.values.forall(_ == ((0L, 1))))
  }

  test("apportionSlots: floors + largest remainders, Σ slots = k exactly") {
    // counts 5/3/2 over k=7: quotas 3.5/2.1/1.4 → floors 3/2/1, one
    // leftover slot goes to the largest remainder (a: .5)
    val rows = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .map((_, 1)).toDF("src", "x")
    val out = Sampling.apportionSlots(rows, col("src"), 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(out.values.sum === 7L)
    // remainder tie (counts 1/1 over k=3): smaller stratum wins the odd slot
    val tied = Seq(("a", 1), ("b", 1)).toDF("src", "x")
    val t = Sampling.apportionSlots(tied, col("src"), 3L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(t === Map("a" -> 2L, "b" -> 1L))
    // k = 0 → all zero
    assert(Sampling.apportionSlots(rows, col("src"), 0L)
      .collect().forall(_.getLong(2) === 0L))
  }

  test("materializeApportioned: exactly k rows, per-stratum counts match the allocation") {
    val rows = ((1 to 50).map(i => ("a", i.toLong)) ++
        (1 to 30).map(i => ("b", i + 100L)) ++
        (1 to 20).map(i => ("c", i + 200L)))
      .toDF("src", "id")
    val out = Sampling.materializeApportioned(rows, col("src"),
        col("id").cast("string"), 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.length === 10)                    // Σ rows = k exactly
    val per = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(per === Map("a" -> 5, "b" -> 3, "c" -> 2))  // 50/30/20 of 100
    // crawl-stable: a second run picks the identical rows
    val out2 = Sampling.materializeApportioned(rows, col("src"),
        col("id").cast("string"), 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.sorted.sameElements(out2.sorted))
    // output schema is the input schema — composes transparently
    assert(Sampling.materializeApportioned(rows, col("src"),
      col("id").cast("string"), 10L).columns.toSeq === Seq("src", "id"))
  }

  test("leakageSafeSplit: clusters never straddle; unpaired docs keep their own key") {
    // pair graph: {1,2,3} via 1-2, 2-3 and {10,11}; 5 and 7 unpaired
    val d = Seq(1L, 2L, 3L, 5L, 7L, 10L, 11L).map(i => (i, s"doc $i"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(d, "doc_id", pairs)
      .select(col("doc_id"), col("rep_id"), col("linked"), col("split"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2), r.getString(3))).toMap
    assert(out.size === 7)                       // left join loses nobody
    // one rep and ONE split per cluster — the no-straddle invariant
    assert(Seq(1L, 2L, 3L).map(out(_)).distinct.size === 1)
    assert(Seq(10L, 11L).map(out(_)).distinct.size === 1)
    assert(out(1L)._1 === 1L && out(10L)._1 === 10L)  // min-id representative
    assert(Seq(1L, 2L, 3L, 10L, 11L).forall(out(_)._2))
    // unpaired docs: own id as rep, bucketed exactly as a plain hash split
    assert(out(5L) === ((5L, false, out(5L)._3)))
    val plain = d.filter(col("doc_id") === 5L)
      .select(Sampling.assignSplit(
        Sampling.splitBucket(col("doc_id").cast("string")))).collect()(0).getString(0)
    assert(out(5L)._3 === plain)
  }
}
