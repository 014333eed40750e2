package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native product-quantization kernels. The composable forms (a
 * zip_with+aggregate squared-L2 inside an aggregate argmin fold, per
 * subspace, per cell) are evaluated through interpreted higher-order
 * lambdas; at production codebook geometry (m=8, k=256) encoding ONE
 * vector costs m·k = 2048 interpreted lambda folds — measured at 17+ s
 * for a 6k-vector corpus where the arithmetic itself (m·k·w ≈ 16k
 * multiplies/vector) is sub-second native work. Same argument as
 * CosineSimilarity: these participate in whole-stage codegen with one
 * fused loop.
 *
 * Exactness: per-cell distances accumulate left-to-right in double
 * (the zip_with order) and are rounded through the SAME decimal path as
 * Tables.r6 / Spark's Round(DoubleType): BigDecimal.valueOf(d·10⁶)
 * .setScale(0, HALF_UP) / 10⁶ — PqEquivalenceSpec pins bit-parity with
 * the composable form on random vectors, so the DuckDB oracles gate the
 * native path unchanged.
 */
object PqKernels {

  /** Exactly Tables.drnd(c, 6) for a nonnegative double: Spark's
    * Round(DoubleType, 0) routes through BigDecimal.valueOf (shortest
    * decimal repr, HALF_UP) — this must stay bit-identical to it. */
  def r6d(v: Double): Double =
    java.math.BigDecimal.valueOf(v * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6

  /** Squared L2 between a float sub-vector and a double centroid,
    * left-to-right (the zip_with order), r6'd. */
  def dist2R6(sv: ArrayData, cent: ArrayData): Double = {
    val n = math.min(sv.numElements(), cent.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = sv.getFloat(i).toDouble - cent.getDouble(i)
      acc += d * d
      i += 1
    }
    r6d(acc)
  }

  /** Argmin over (cid, centroid) struct cells: first strict minimum in
    * array (= cid-ascending) order; -1 on an empty cell array — the
    * contract of the composable fold it replaces. */
  def argmin(sv: ArrayData, cells: ArrayData): Long = {
    var bestCid = -1L
    var bestD = Double.MaxValue
    var i = 0
    val n = cells.numElements()
    while (i < n) {
      val cell = cells.getStruct(i, 2)
      val d = dist2R6(sv, cell.getArray(1))
      if (d < bestD) { bestD = d; bestCid = cell.getLong(0) }
      i += 1
    }
    bestCid
  }

  /** Dense LUT row: r6'd distance per centroid slot, null slots stay
    * null (empty sign buckets — no corpus code references them). */
  def subDists(sv: ArrayData, cents: ArrayData): ArrayData = {
    val n = cents.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (cents.isNullAt(i)) null else dist2R6(sv, cents.getArray(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** codes cell: nearest-centroid cid for one subspace's slice against its
  * cid-sorted (cid, centroid) cells. */
case class PqArgmin(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_argmin"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(a, b)), _))
        if a.dataType == LongType &&
           b.dataType.isInstanceOf[ArrayType] &&
           b.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<struct<cid: bigint, " +
            s"centroid: array<double>>>), got ${other._1.sql} and ${other._2.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.argmin(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqKernels.argmin($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqArgmin =
    copy(left = newLeft, right = newRight)
}

/** One query's dense ADC LUT row for one subspace: r6'd squared-L2 per
  * centroid slot (null-preserving). */
case class PqSubDists(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "graft_pq_sub_dists"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<array<double>>), " +
            s"got ${other._1.sql} and ${other._2.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.subDists(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqKernels.subDists($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqSubDists =
    copy(left = newLeft, right = newRight)
}
