package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.operators.TextHashing

/**
 * All `k` MinHash signature values of a gram-hash set in ONE pass over the
 * array: element j = min over the set of the j-th universal hash
 * (h*a_j + b_j) % P. k = 16 (the default profile, registered as
 * graft_minhash_sig) or 30 (the scaled large-corpus profile,
 * graft_minhash_sig30); hashes j < 16 are identical across profiles
 * because MinHashParamsScaled extends MinHashParams.
 *
 * Semantically identical to the composable form
 *   array_min(transform(gs, h => (h*a_j + b_j) % P))  for each j
 * (TextHashing.minHashJ) — same Java long arithmetic (wrap on overflow,
 * remainder sign follows the dividend), same empty/null behavior — but the
 * composable form materializes 16 transformed arrays per row and walks the
 * set 16 times through the interpreted higher-order-function path; this
 * kernel walks it once, keeping the signature projection inside
 * whole-stage codegen (MinHashSigSpec pins the equivalence
 * property-style). The DuckDB oracle is unchanged: it recomputes the same
 * polynomials from SQL (minHashJSql).
 */
case class MinHashSignature(child: Expression, k: Int = 16)
    extends UnaryExpression {

  require(k > 0 && k <= MinHashSignature.MaxK,
    s"graft_minhash_sig supports 1..${MinHashSignature.MaxK} hashes, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (k == 16) "graft_minhash_sig" else s"graft_minhash_sig$k"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<bigint> argument, got ${other.sql}")
    }

  // empty set → null, mirroring array_min(empty) in the composable form
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    MinHashSignature.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, a =>
      s"""org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.MinHashSignature.compute($a, $k);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  private val A: Array[Long] = TextHashing.MinHashParamsScaled.map(_._1).toArray
  private val B: Array[Long] = TextHashing.MinHashParamsScaled.map(_._2).toArray
  val MaxK: Int = A.length
  private val P: Long = TextHashing.P

  /** One-pass k-min kernel, shared by eval and codegen. Plain JVM long
    * arithmetic == Spark's non-ANSI `*`/`+`/`%` on BIGINT, so the values
    * match the composable formulation bit-for-bit even where h*a+b would
    * wrap. Returns null for an empty set (array_min semantics). */
  def compute(gs: ArrayData, k: Int): ArrayData = {
    val n = gs.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = gs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * A(j) + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
