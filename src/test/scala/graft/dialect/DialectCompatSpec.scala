package graft.dialect

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.{Dialect, TestSpark}

/**
  * Dialect proof: every SQL string in the reference's 48 E2E suites (638
  * queries) must run through EngineContext.sql — analysis, physical plan,
  * and execution — on both the plain and WITH_NULLS full-schema catalogs,
  * with MESSAGE_VALIDATION tests failing analysis as their suites intend.
  * Regenerates DIALECT_COMPAT.md so the committed report always matches
  * the code under test.
  */
class DialectCompatSpec extends AnyFunSuite {

  test("all reference E2E suite queries plan and execute (plain + nulls)") {
    assume(E2eSuites.available, "reference E2E suites not present")
    val tests = E2eSuites.load()
    assert(tests.size >= 600, s"parser found only ${tests.size} SQL blocks")
    assert(tests.map(_.suite).distinct.size == 48, "expected 48 suites")

    val spark = TestSpark.spark
    val results = DialectRunner.run(spark, nulls = false) ++
      DialectRunner.run(spark, nulls = true)
    Files.write(Paths.get("/root/repo/DIALECT_COMPAT.md"),
      DialectRunner.report(results).getBytes(StandardCharsets.UTF_8))

    val fails = results.filterNot(r => Set("ok", "expected-error")(r.phase))
    assert(fails.isEmpty,
      fails.take(10).map(f => s"${f.test.suite}/${f.test.name}: ${f.error}").mkString("\n"))
  }

  test("dialect rewrites: bare VARCHAR and interval leading-field precision") {
    assert(Dialect.rewrite("select cast(o_orderkey as VARCHAR) from orders")
      == "select cast(o_orderkey as STRING) from orders")
    // VARCHAR(n) and string literals must be untouched
    assert(Dialect.rewrite("select cast(x as varchar(10)), 'as varchar' from t")
      == "select cast(x as varchar(10)), 'as varchar' from t")
    assert(Dialect.rewrite("select INTERVAL '2 10' DAY(1) TO HOUR from region")
      == "select INTERVAL '2 10' DAY TO HOUR from region")
    assert(Dialect.rewrite("select INTERVAL '123:15' HOUR(3) TO MINUTE from region")
      == "select INTERVAL '123:15' HOUR TO MINUTE from region")
    // hour() the FUNCTION keeps its parens (no TO follows)
    assert(Dialect.rewrite("select hour(2) from t") == "select hour(2) from t")
  }

  test("dialect rewrites: strptime datetime formats, LIKE wildcards untouched") {
    assert(Dialect.rewrite("select TO_DATE(x, '%Y-%m-%d %H:%M:%S') from t")
      == "select TO_DATE(x, 'yyyy-MM-dd HH:mm:ss') from t")
    assert(Dialect.rewrite("select TO_TIMESTAMP(y, '%Y|%m|%d') from t")
      == "select TO_TIMESTAMP(y, 'yyyy|MM|dd') from t")
    assert(Dialect.rewrite("select * from part where p_type like '%BRASS'")
      == "select * from part where p_type like '%BRASS'")
  }

  test("dialect rewrite is idempotent over the whole suite corpus") {
    assume(E2eSuites.available, "reference E2E suites not present")
    for (t <- E2eSuites.load()) {
      val once = Dialect.rewrite(t.sql)
      assert(Dialect.rewrite(once) == once, s"${t.suite}/${t.name} not a fixpoint")
    }
  }

  test("dialect rewrites: REGEXP_REPLACE replacement backreferences \\N -> $N") {
    assert(Dialect.rewrite(
      "SELECT REGEXP_REPLACE(c, '[a-z]{2}([a-z]{2})([a-z]{2})', '\\2--\\1') FROM t")
      == "SELECT REGEXP_REPLACE(c, '[a-z]{2}([a-z]{2})([a-z]{2})', '$2--$1') FROM t")
    // 4-arg position form: same third-arg rewrite, position untouched
    assert(Dialect.rewrite("SELECT REGEXP_REPLACE(c, '(x)', '\\1!', 4) FROM t")
      == "SELECT REGEXP_REPLACE(c, '(x)', '$1!', 4) FROM t")
    // the regex PATTERN keeps its backslashes (only arg 3 is a replacement)
    assert(Dialect.rewrite("SELECT REGEXP_REPLACE(c, '\\d+', 'N') FROM t")
      == "SELECT REGEXP_REPLACE(c, '\\d+', 'N') FROM t")
    // commas inside literal args don't shift the argument boundaries
    assert(Dialect.rewrite("SELECT REGEXP_REPLACE(c, 'a{1,3}', '\\1,ok') FROM t")
      == "SELECT REGEXP_REPLACE(c, 'a{1,3}', '$1,ok') FROM t")
    // inside a string literal the call name is ignored
    assert(Dialect.rewrite("SELECT 'REGEXP_REPLACE(a, b, ''\\1'')' FROM t")
      == "SELECT 'REGEXP_REPLACE(a, b, ''\\1'')' FROM t")
    // idempotent: a rewritten (or already-$N) replacement is untouched
    assert(Dialect.rewrite("SELECT REGEXP_REPLACE(c, '(x)', '$1!') FROM t")
      == "SELECT REGEXP_REPLACE(c, '(x)', '$1!') FROM t")
    // literal $ mixed with backrefs: \N becomes $N, $ becomes \$ (the
    // java.util.regex replacement escape). Engine sessions run with
    // escapedStringLiterals=true, so the literal reaches the function
    // verbatim. The result is a fixpoint.
    val mixed = Dialect.rewrite("SELECT REGEXP_REPLACE(c, '(\\d+)', '$\\1.00') FROM t")
    assert(mixed == "SELECT REGEXP_REPLACE(c, '(\\d+)', '\\$$1.00') FROM t")
    assert(Dialect.rewrite(mixed) == mixed)
    // pre-escaped \$ alongside a backref is not double-escaped
    assert(Dialect.rewrite("SELECT REGEXP_REPLACE(c, '(x)', '\\$\\1') FROM t")
      == "SELECT REGEXP_REPLACE(c, '(x)', '\\$$1') FROM t")
  }

  test("literal fidelity EXECUTES: backslash patterns and $/backref replacements") {
    val ctx = new graft.EngineContext(graft.TestSpark.spark)
    // Calcite literal semantics: '\d+' IS the regex \d+ (Spark's default
    // parser would silently strip the backslash and match the letter d)
    assert(ctx.sql("SELECT REGEXP_REPLACE('a12b', '\\d+', 'N') AS r")
      .collect()(0).getString(0) == "aNb")
    // mixed literal $ and \N backref in the replacement
    assert(ctx.sql(
      "SELECT REGEXP_REPLACE('price 42 units', '(\\d+)', '$\\1.00') AS r")
      .collect()(0).getString(0) == "price $42.00 units")
  }

  test("dialect rewrites: slashed date literals in CAST") {
    assert(Dialect.rewrite("select CAST('1997/05/02' as date) from region")
      == "select CAST('1997-05-02' AS DATE) from region")
    // only the literal CAST shape — column casts and dashed literals untouched
    assert(Dialect.rewrite("select cast(c as date), cast('1997-05-02' as date) from t")
      == "select cast(c as date), cast('1997-05-02' as date) from t")
  }
}
