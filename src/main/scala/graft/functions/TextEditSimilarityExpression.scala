package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the X2 anchored-edit-distance kernel:
  * `|gene| − dp(n,n)` of the INF-bordered anchored DP (reference
  * `text_distance.py` semantics — first characters always align), wobble
  * `c≈t` as in the other kernels. The codegen tier of SURVEY §7.3's
  * preference ladder: `doGenCode` emits a static call into the kernel with
  * a per-operator reusable DP buffer, so the expression stays inside
  * whole-stage codegen (no ScalaUDF iterator break, no String
  * materialization — bytes straight off the UTF8String).
  *
  * Semantics identical to
  * [[graft.bio.SimilarityKernels.textEditScore]]`(gene, window, 0)` for
  * windows at least as long as the gene (spec-pinned); shorter windows
  * score over the common prefix instead of throwing.
  */
case class TextEditSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "text_edit_similarity_native"

  override protected def nullSafeEval(gene: Any, window: Any): Any = {
    val g = gene.asInstanceOf[UTF8String].getBytes
    val w = window.asInstanceOf[UTF8String].getBytes
    val n = math.min(g.length, w.length)
    TextEditSimilarity.compute(g, w, n, TextEditSimilarity.ensureBuf(null, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bufName = ctx.addMutableState("int[]", "textEditDpBuf")
    nullSafeCodeGen(ctx, ev, (g, w) => {
      val gb = ctx.freshName("geneBytes")
      val wb = ctx.freshName("windowBytes")
      val n = ctx.freshName("n")
      s"""
         |byte[] $gb = $g.getBytes();
         |byte[] $wb = $w.getBytes();
         |int $n = java.lang.Math.min($gb.length, $wb.length);
         |$bufName = graft.functions.TextEditSimilarity.ensureBuf($bufName, $n);
         |${ev.value} = graft.functions.TextEditSimilarity.compute($gb, $wb, $n, $bufName);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TextEditSimilarity =
    copy(left = newLeft, right = newRight)
}

object TextEditSimilarity {

  /** Grow-only DP scratch: (n+1)² ints, reused across rows by codegen. */
  def ensureBuf(buf: Array[Int], n: Int): Array[Int] = {
    val need = (n + 1) * (n + 1)
    if (buf != null && buf.length >= need) buf else new Array[Int](math.max(need, 1))
  }

  /** Anchored edit-distance score over the length-`n` prefixes of `gene`
    * and `window` — same DP as
    * [[graft.bio.SimilarityKernels.textEditScoreOnlyB]] with an explicit
    * length (the UTF8String byte arrays are not pre-truncated).
    */
  def compute(gene: Array[Byte], window: Array[Byte], n: Int, dp: Array[Int]): Double = {
    val w = n + 1
    val INF = 999999
    java.util.Arrays.fill(dp, 0, w * w, INF)
    dp(0) = 0
    var i = 1
    while (i <= n) {
      val ga = gene(i - 1)
      val row = i * w
      val prev = row - w
      var j = 1
      while (j <= n) {
        val gb = window(j - 1)
        var best = dp(prev + j) + 1
        val left = dp(row + j - 1) + 1
        if (left < best) best = left
        val matches = ga == gb || (ga == 'c' && gb == 't')
        val diag = dp(prev + j - 1) + (if (matches) 0 else 1)
        if (diag < best) best = diag
        dp(row + j) = best
        j += 1
      }
      i += 1
    }
    (n - dp(n * w + n)).toDouble
  }
}
