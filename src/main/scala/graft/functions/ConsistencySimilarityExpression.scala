package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-light byte-level form of the X3 consistency kernel score
  * (reference `consistency_similarity.py:35-64`): longest match-run where
  * up to `patience` mismatch-gaps may be bridged. Same run-collection +
  * run-merge walk as [[graft.bio.SimilarityKernels.consistencyScore]]
  * (equality property-tested), but over byte arrays with flat int-array
  * run buffers — callable straight from generated Java via the object's
  * static forwarder, which is what [[ConsistencySimilarity]]'s codegen
  * does. Shorter windows score over the common prefix (same guard as the
  * X1 native expression).
  */
object ConsistencyKernel {
  def score(gene: Array[Byte], window: Array[Byte], patience: Int): Double = {
    val n = math.min(gene.length, window.length)
    if (n == 0) return 0.0
    val runLen = new Array[Int](n + 1)
    val runEnd = new Array[Int](n + 1)
    var nRuns = 0
    var best = 0
    var cur = 0
    var i = 0
    while (i < n) {
      val a = gene(i); val b = window(i)
      if (a == b || (a == 'c' && b == 't')) {
        cur += 1
        if (i == n - 1) { runLen(nRuns) = cur; runEnd(nRuns) = n; nRuns += 1 }
      } else {
        runLen(nRuns) = cur; runEnd(nRuns) = i; nRuns += 1
        cur = 0
      }
      if (cur > best) best = cur
      i += 1
    }
    var idx = 0
    while (idx < nRuns) {
      val left = runEnd(idx) - runLen(idx)
      var total = 0
      var width = 0
      var continue = true
      while (continue && width <= patience) {
        if (width + idx < nRuns) {
          val totalLen = runEnd(idx + width) - left
          total += runLen(idx + width)
          if (totalLen - total > patience) continue = false
          else if (best < total) best = total
        }
        width += 1
      }
      idx += 1
    }
    best.toDouble
  }
}

/** Native Catalyst expression for the flagship X3 consistency kernel —
  * `consistency_similarity_native(gene, window, patience)`. The codegen
  * tier of SURVEY §7.3's ladder for the scoring function the reference
  * exists to compute: fuses into whole-stage codegen as a single static
  * call on byte arrays (no UDF invocation, no String materialization,
  * no boxing of the patience argument).
  */
case class ConsistencySimilarity(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "consistency_similarity_native"

  override protected def nullSafeEval(gene: Any, window: Any, patience: Any): Any =
    ConsistencyKernel.score(
      gene.asInstanceOf[UTF8String].getBytes,
      window.asInstanceOf[UTF8String].getBytes,
      patience.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, w, p) =>
      s"${ev.value} = graft.functions.ConsistencyKernel.score($g.getBytes(), $w.getBytes(), $p);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ConsistencySimilarity =
    copy(first = newFirst, second = newSecond, third = newThird)
}
