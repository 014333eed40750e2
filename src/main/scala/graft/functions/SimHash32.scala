package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * 32-bit SimHash fingerprint of a document in ONE row-local pass: tokenize
 * on single spaces, hash each non-empty token (TextHashing.tokenHash's
 * ascii polynomial), accumulate ±1 per bit, emit the sign bits.
 *
 * A document's SimHash depends only on its OWN tokens, so the
 * explode→groupBy(doc) formulation (operators.Dedup
 * .simHashFingerprintsAggregate) ships |corpus tokens| rows through a
 * shuffle to compute what is really a projection. This expression removes
 * that shuffle entirely — at 100 TB the fingerprint stage becomes pure
 * map-side work fused into the scan. Values are bit-identical to the
 * aggregate form (SimHashSigSpec pins corpus + degenerate/unicode inputs);
 * the DuckDB oracle is unchanged (same polynomial from SQL, tokenHashSql).
 *
 * Null/empty contract: a doc with no non-empty token produces NO row in
 * the aggregate form (its tokens are all filtered), so this expression
 * returns null there and callers filter nulls — same visible set.
 */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def nullSafeEval(s: Any): Any =
    SimHash32.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("fp")
    nullSafeCodeGen(ctx, ev, s =>
      s"""Object $boxed = graft.functions.SimHash32.compute($s);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $boxed).longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {

  /** Row-local SimHash kernel, shared by eval and codegen. Mirrors the
    * composable chain split(text,' ') → filter(length>0) → tokenHash →
    * 32 ±1 counters → sign bits: code-point semantics for ascii/substr/
    * length, Java long arithmetic, counter>0 sets the bit (ties → 0).
    * Returns null (boxed) when no non-empty token exists. */
  def compute(s: UTF8String): java.lang.Long = {
    val cps = s.toString.codePoints().toArray
    val counters = new Array[Int](32)
    var sawToken = false
    var start = 0
    val n = cps.length
    var i = 0
    while (i <= n) {
      if (i == n || cps(i) == ' ') {
        val len = i - start
        if (len > 0) {
          sawToken = true
          val c1 = cps(start).toLong
          val c2 = if (len > 1) cps(start + 1).toLong else 0L
          val c3 = if (len > 2) cps(start + 2).toLong else 0L
          val c4 = if (len > 3) cps(start + 3).toLong else 0L
          val h = c1 * 29791L + c2 * 961L + c3 * 31L + c4 + len * 131L
          var b = 0
          while (b < 32) {
            if (((h >> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (!sawToken) return null
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (counters(b) > 0) fp |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }
}
