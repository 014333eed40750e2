package graft

/**
 * SQL dialect shims: the reference speaks Apache Calcite SQL with its own
 * conformance (reference: algebra/blazingdb-calcite-core/src/main/java/com/
 * blazingdb/calcite/sql/validate/BlazingSqlConformance.java — lenient `%`,
 * LIMIT, etc.), and a handful of Calcite-isms don't parse in Spark SQL.
 * This is the Spark-side analog of the reference's own query-string
 * preprocessing (pyblazing/pyblazing/apiv2/context.py:3091-3105 modifies
 * queries before handing them to Calcite).
 *
 * Rewrites are token-level and never touch single-quoted string literals.
 * Proven against all 48 reference E2E suites (DIALECT_COMPAT.md):
 *
 *  - `CAST(x AS VARCHAR)` — Calcite's length-less VARCHAR is Spark's
 *    STRING (Spark requires VARCHAR(n)). `VARCHAR(n)` is left alone.
 *  - `INTERVAL '2 10' DAY(1) TO HOUR` — Calcite allows a leading-field
 *    precision on interval qualifiers; Spark does not. The precision only
 *    constrains literal width, so dropping it preserves semantics.
 *    Only stripped when followed by `TO`, so the hour()/minute()/second()
 *    FUNCTIONS never match.
 *  - `CAST('1997/05/02' AS DATE)` — the reference's cudf parser accepts
 *    slashed date literals (castSuite.yaml TEST_15); Spark non-ANSI casts
 *    them to NULL. Separators normalized to dashes.
 *  - strptime-style datetime formats (`'%Y-%m-%d %H:%M:%S'`) — the
 *    reference's TO_DATE/TO_TIMESTAMP take C/cudf format strings
 *    (reference: toTimestampSuite.yaml TEST_01-04, whose SPARK comparison
 *    blocks spell out the equivalence to Java patterns). Translated only
 *    when the literal is a comma-following argument made purely of % tokens
 *    and separators, so LIKE '%BRASS' wildcards are never touched.
 */
object Dialect {

  // a single-quoted SQL literal, with '' as the escaped quote
  private val Literal = "'(?:[^']|'')*'".r

  private val BareVarchar = "(?i)\\bVARCHAR\\b(?!\\s*\\()".r
  private val IntervalLeadingPrecision =
    "(?i)\\b(YEAR|MONTH|DAY|HOUR|MINUTE|SECOND)\\s*\\(\\d+\\)(?=\\s+TO\\b)".r

  // CAST('1997/05/02' AS DATE): the reference's cudf date parser accepts
  // slashed literals (castSuite.yaml TEST_15); Spark's non-ANSI cast
  // yields NULL for them. Normalize the literal's separators.
  private val SlashedDateCast =
    "(?i)CAST\\s*\\(\\s*'(\\d{4})/(\\d{1,2})/(\\d{1,2})'\\s+AS\\s+DATE\\s*\\)".r

  // a format-argument literal: follows a comma, contains a % token, and is
  // built only from strptime tokens plus separator punctuation
  private val StrptimeArg = "(,\\s*)'([%YymdHMSf:|/\\-\\. ]*%[YymdHMSf][%YymdHMSf:|/\\-\\. ]*)'".r
  private val StrptimeTokens = Seq(
    "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss", "%f" -> "SSSSSS")

  /** Rewrite Calcite-dialect constructs to their Spark SQL equivalents. */
  def rewrite(sql: String): String = {
    val sd = SlashedDateCast.replaceAllIn(sql, m =>
      s"CAST('${m.group(1)}-${m.group(2)}-${m.group(3)}' AS DATE)")
    val s0 = StrptimeArg.replaceAllIn(sd, m =>
      java.util.regex.Matcher.quoteReplacement(
        m.group(1) + "'" + StrptimeTokens.foldLeft(m.group(2)) {
          case (s, (from, to)) => s.replace(from, to)
        } + "'"))
    mapOutsideLiterals(s0) { seg =>
      val s1 = BareVarchar.replaceAllIn(seg, "STRING")
      IntervalLeadingPrecision.replaceAllIn(s1, m => m.group(1))
    }
  }

  /** Apply `f` to the segments of `sql` outside single-quoted literals. */
  private def mapOutsideLiterals(sql: String)(f: String => String): String = {
    val sb = new StringBuilder
    var last = 0
    for (m <- Literal.findAllMatchIn(sql)) {
      sb ++= f(sql.substring(last, m.start))
      sb ++= m.matched
      last = m.end
    }
    sb ++= f(sql.substring(last))
    sb.result()
  }
}
