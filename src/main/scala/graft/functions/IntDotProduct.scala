package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * Exact integer dot product over two Array[Int] quantized-code columns —
 * the integer-dot analog of [[CosineSimilarity]] for the int8-quantized
 * ANN path (SimilaritySearch.quantizedTopK): the composable
 * `aggregate(zip_with(a,b,*), 0L, +)` form evaluates interpreted
 * higher-order lambdas per candidate pair, the last interpreted HOF in a
 * pair loop; this expression fuses the same arithmetic into whole-stage
 * codegen.
 *
 * Semantics match the composable form exactly (IntDotEquivalenceSpec pins
 * it property-based):
 *  - products and the accumulator are LONG (no overflow for int8 codes at
 *    any realistic dimensionality; same widening as the HOF's cast);
 *  - `zip_with` pads the SHORTER array with nulls, a null product nullifies
 *    the running sum, and `null + x` stays null — so unequal lengths or any
 *    null element in the compared prefix yield NULL, not a partial sum;
 *  - accumulation is left-to-right in array order (integer addition is
 *    associative, but keeping the order makes the equivalence exact by
 *    construction, not just by value).
 */
case class IntDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_qdot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<int> arguments, " +
            s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    if (xa.numElements() != xb.numElements()) return null
    val n = xa.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (xa.isNullAt(i) || xb.isNullAt(i)) return null
      acc += xa.getInt(i).toLong * xb.getInt(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) $a.getInt($i) * (long) $b.getInt($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}
