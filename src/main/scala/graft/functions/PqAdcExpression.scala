package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Native codegen ADC (asymmetric-distance) accumulation for the IVF-PQ
  * probe: `celldot + Σ_sub lut[sub*ks + code[sub]]` — the query↔centroid
  * dot plus, per subspace, the precomputed query↔codeword dot the one-byte
  * code selects. Strict ascending-subspace fold, the exact operation order
  * the DuckDB oracle replicates (`list_prepend(celldot, ...)` reduced
  * left-to-right), so approx scores match bit-for-bit.
  *
  * Replaces the `Seq[Double]` UDF tier on the candidates hot path: the
  * shortlist relation is |probes|×|cell members| rows, and per row the UDF
  * boxed the m·ks-double LUT element-by-element and split the probe join's
  * stage out of whole-stage codegen — the r10 `dd_ppjoin` pathology on the
  * ANN family's biggest intermediate (see [[DoubleArrayDot]],
  * [[SortedLongIntersectCount]]).
  *
  * A LUT whose length differs from `code.length * ks` throws loud
  * (mismatched PQ model vs index layout is corruption; a silent partial
  * fold would rank on garbage). Nulls propagate.
  */
case class PqAdc(
    celldot: Expression,
    lut: Expression,
    code: Expression,
    ks: Int) extends TernaryExpression {

  override def first: Expression = celldot
  override def second: Expression = lut
  override def third: Expression = code

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (celldot.dataType, lut.dataType, code.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _), BinaryType) if ks > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (c, l, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, array<double>, binary) with ks > 0, " +
          s"got ($c, $l, $d) ks=$ks")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_native"

  override protected def nullSafeEval(c: Any, l: Any, d: Any): Any = {
    val lutData = l.asInstanceOf[ArrayData]
    val codes = d.asInstanceOf[Array[Byte]]
    PqAdc.requireLayout(lutData.numElements(), codes.length, ks)
    var s = c.asInstanceOf[Double]
    var sub = 0
    while (sub < codes.length) {
      s += lutData.getDouble(sub * ks + (codes(sub) & 0xff))
      sub += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l, d) => {
      val sub = ctx.freshName("sub")
      val s = ctx.freshName("s")
      val helper = PqAdc.getClass.getName.stripSuffix("$")
      s"""
         |$helper.requireLayout($l.numElements(), $d.length, $ks);
         |double $s = $c;
         |for (int $sub = 0; $sub < $d.length; $sub++) {
         |  $s += $l.getDouble($sub * $ks + ($d[$sub] & 0xff));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqAdc =
    copy(celldot = newFirst, lut = newSecond, code = newThird)
}

object PqAdc {
  /** Layout guard shared by the interpreted and generated paths. */
  def requireLayout(lutLen: Int, m: Int, ks: Int): Unit =
    if (lutLen != m * ks) throw new IllegalArgumentException(
      s"pq_adc_native: LUT holds $lutLen entries but the code layout needs " +
        s"m*ks = $m*$ks (PQ model / index layout mismatch — refusing to " +
        "rank on a partial fold)")
}
