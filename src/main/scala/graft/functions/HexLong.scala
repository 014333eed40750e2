package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass hex-window parse: the value of `digits` hex chars of the
 * child string starting at 1-based `start` — the codegen'd form of
 * TextAnalysis.hexParse's per-digit polynomial
 * `Σ hexVal(substring(h, start+i, 1)) · 16^(digits-1-i)`.
 *
 * Why a kernel: the polynomial expands to `digits` substring+ascii+CASE
 * terms per value; q111's four CMS slices evaluate 32 of them per
 * token, q101's hex48 twelve per gram — measured at ~1.5 s of the 3.2 s
 * q111 spends at sf0.1. This computes the identical value in one byte
 * loop, INCLUDING hexVal's documented quirks (missing chars read as
 * ascii 0 → digit −48; case handling via the ≥97 branch), so it is a
 * drop-in under TextAnalysis.hexParse with every oracle unchanged
 * (hexParseSql still states the polynomial — HexLongSpec pins
 * kernel ≡ polynomial on full md5s, truncated strings, and uppercase).
 */
case class HexLong(child: Expression, start: Int, digits: Int)
    extends UnaryExpression {

  // validated at expression construction (plan time), so SQL misuse via
  // the registered function fails with a clear message instead of an
  // executor ArrayIndexOutOfBounds (start<=0) or a silently mod-64
  // wrapped shift (digits>15 — the polynomial's documented ceiling)
  require(start >= 1, s"graft_hex_long: start must be >= 1, got $start")
  require(digits >= 1 && digits <= 15,
    s"graft_hex_long: digits must be in 1..15, got $digits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hex_long"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def nullSafeEval(s: Any): Any =
    HexLong.parse(s.asInstanceOf[UTF8String], start, digits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HexLong.parse($s, $start, $digits);")

  override protected def withNewChildInternal(newChild: Expression): HexLong =
    copy(child = newChild)
}

object HexLong {

  /** Mirrors ascii(substring(h, pos, 1)): the code point of the char at
    * 1-based `pos`, or 0 past the end. */
  private def asciiAt(s: UTF8String, chars: Int, pos0: Int): Int =
    if (pos0 >= chars) 0
    else {
      val sub = s.substringSQL(pos0 + 1, 1)
      if (sub.numBytes == 0) 0 else sub.toString.codePointAt(0)
    }

  def parse(s: UTF8String, start: Int, digits: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    // ASCII fast path: every hex string this engine parses is ASCII;
    // byte index == char index and byte value == code point.
    var ascii = true
    var j = 0
    while (ascii && j < n) { if (bytes(j) < 0) ascii = false; j += 1 }
    var v = 0L
    var i = 0
    while (i < digits) {
      val pos0 = start - 1 + i
      val c =
        if (ascii) { if (pos0 < n) bytes(pos0).toInt else 0 }
        else asciiAt(s, s.numChars(), pos0)
      val d = c - 48 - (if (c >= 97) 39 else 0)
      v += d.toLong << (4 * (digits - 1 - i))
      i += 1
    }
    v
  }
}
