package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product of two `array<double>` columns with a strict
  * LEFT-TO-RIGHT fold — the exact summation order the DuckDB oracle's
  * `list_reduce` twin uses, so scores match bit-for-bit (floating-point
  * addition is not associative; a reordered or vectorized-reassociated sum
  * would drift in the last ulp and break full-hash comparison).
  *
  * Replaces the `Seq[Double]` UDF tier of the ANN kernels: per evaluated
  * pair the UDF boxed both arrays element-by-element and kept the
  * surrounding stage out of whole-stage codegen (the same pathology r10
  * profiled in `dd_ppjoin`'s verify — see
  * [[SortedLongIntersectCount]]). Reads `ArrayData.getDouble` directly.
  *
  * Mismatched lengths throw (`IllegalArgumentException`): a ragged
  * embedding row is data corruption, and a silent common-prefix fold would
  * turn it into a plausible-looking wrong score that flows into ranks
  * undetected (the UDF this replaces also failed loud, via
  * IndexOutOfBounds). Nulls propagate.
  */
case class DoubleArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_array_dot_native"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    DoubleArrayDot.requireSameDim(n, y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "double_array_dot_native: mismatched vector dimensions " + $n +
         |    " vs " + $b.numElements() +
         |    " (ragged embedding row — refusing to fold a silent prefix)");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleArrayDot =
    copy(left = newLeft, right = newRight)
}

object DoubleArrayDot {
  /** Interpreted-path dimension check (the generated code inlines the
    * same guard with identical error text).
    */
  def requireSameDim(na: Int, nb: Int): Unit =
    if (na != nb) throw new IllegalArgumentException(
      s"double_array_dot_native: mismatched vector dimensions $na vs $nb " +
        "(ragged embedding row — refusing to fold a silent prefix)")
}
