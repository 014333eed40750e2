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
 *  - `REGEXP_REPLACE(s, re, '\2--\1' [, pos])` — Calcite/cudf spell
 *    replacement backreferences `\N` (simpleStringSuite.yaml TEST_17,
 *    whose SPARK block shows the `$N` equivalent); Spark's java.util.regex
 *    replacement syntax is `$N`. Only the THIRD argument literal is
 *    rewritten — regex patterns (2nd arg) keep their backslashes.
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
    val br = rewriteRegexpReplaceBackrefs(sql)
    val sd = SlashedDateCast.replaceAllIn(br, m =>
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

  /** Rewrite `\N` → `$N` inside the replacement literal (3rd argument) of
    * every REGEXP_REPLACE call, pre-escaping any literal `$` in the same
    * literal to `\$` so it survives Spark's replacement parsing (Calcite/
    * cudf treat `$` as plain text). Literals without `\N` backrefs pass
    * through untouched — including $-only ones, where no rewrite marker
    * exists to keep escaping idempotent. Quote-aware argument scan: commas
    * and parens inside string literals never shift argument boundaries,
    * and a REGEXP_REPLACE spelled inside a literal is ignored. */
  private def rewriteRegexpReplaceBackrefs(sql: String): String = {
    val litSpans = Literal.findAllMatchIn(sql).map(m => (m.start, m.end)).toVector
    def litEnd(p: Int): Int =
      litSpans.collectFirst { case (s, e) if s <= p && p < e => e }.getOrElse(-1)

    val Name = "REGEXP_REPLACE"
    val up = sql.toUpperCase(java.util.Locale.ROOT)
    val edits = Vector.newBuilder[(Int, Int, String)] // [start, end) -> text
    var i = 0
    while (i >= 0 && i < sql.length) {
      val j = up.indexOf(Name, i)
      if (j < 0) i = -1
      else {
        i = j + Name.length
        val wordStart = j == 0 || { val c = sql(j - 1); !c.isLetterOrDigit && c != '_' }
        if (wordStart && litEnd(j) < 0) {
          var k = i
          while (k < sql.length && sql(k).isWhitespace) k += 1
          if (k < sql.length && sql(k) == '(') {
            // argument spans at paren depth 1, skipping literals wholesale
            var depth = 0; var p = k; var argStart = k + 1
            val args = Vector.newBuilder[(Int, Int)]
            var closed = false
            while (p < sql.length && !closed) {
              val le = litEnd(p)
              if (le >= 0) p = le
              else {
                sql(p) match {
                  case '(' => depth += 1
                  case ')' =>
                    depth -= 1
                    if (depth == 0) { args += ((argStart, p)); closed = true }
                  case ',' if depth == 1 =>
                    args += ((argStart, p)); argStart = p + 1
                  case _ => ()
                }
                p += 1
              }
            }
            val as = args.result()
            if (closed && as.length >= 3) {
              val (s3, e3) = as(2)
              val t = sql.substring(s3, e3).trim
              // fire only on \N-containing literals: the output contains
              // $N group refs and no \N, so a second pass never re-fires
              // (idempotent). In the same pass, literal `$` is escaped to
              // `\$` so Spark's replacement parser keeps it literal —
              // Calcite/cudf treat $ as plain text. A $-bearing literal
              // withOUT backrefs is left untouched (no rewrite marker to
              // make escaping idempotent; the reference suites never mix
              // bare $ into replacement text).
              if (t.length >= 2 && t.head == '\'' && t.last == '\'' &&
                  t.matches("(?s).*\\\\\\d.*")) {
                val body = t.substring(1, t.length - 1)
                val sb = new StringBuilder
                var bi = 0
                while (bi < body.length) {
                  val ch = body(bi)
                  if (ch == '\\' && bi + 1 < body.length && body(bi + 1).isDigit) {
                    sb += '$'; sb += body(bi + 1); bi += 2 // \N -> $N
                  } else if (ch == '\\' && bi + 1 < body.length) {
                    sb += ch; sb += body(bi + 1); bi += 2 // other escapes as-is
                  } else if (ch == '$') {
                    // literal $ must reach Java's replacement parser as \$.
                    // Engine sessions run with escapedStringLiterals=true
                    // (EngineContext — Calcite literal semantics), so the
                    // SQL text '\$' arrives at the function untouched;
                    // DialectCompatSpec executes this end-to-end.
                    sb ++= "\\$"; bi += 1
                  } else { sb += ch; bi += 1 }
                }
                val lead = sql.substring(s3, e3).takeWhile(_.isWhitespace)
                edits += ((s3, e3, s"$lead'${sb.result()}'"))
              }
            }
          }
        }
      }
    }
    val es = edits.result().sortBy(_._1)
    if (es.isEmpty) sql
    else {
      val sb = new StringBuilder
      var last = 0
      es.foreach { case (s, e, t) => sb ++= sql.substring(last, s) ++= t; last = e }
      sb ++= sql.substring(last)
      sb.result()
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
