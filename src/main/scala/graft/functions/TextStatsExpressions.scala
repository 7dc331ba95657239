package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.TextOps.HashPrime

/** Native Gopher-style repetition signals (r11, closing the text-analysis
  * native sweep): one pass per document computing
  * `(n_tokens, dup_token_frac, top_bigram_frac)` — the `tx_repetition`
  * map kernel. Replaces a `String => (Int, Double, Double)` UDF; field
  * names `_1/_2/_3` match the tuple encoder's so the query's
  * `col("r._1")` projections are unchanged. Each output is one integer
  * division — bit-identical across engines with no rounding tricks.
  * SQL form: `repetition_stats_native(text)`.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("_1", IntegerType, nullable = false),
    StructField("_2", DoubleType, nullable = false),
    StructField("_3", DoubleType, nullable = false)))
  override def prettyName: String = "repetition_stats_native"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("repStatsHelper", RepetitionStats,
      RepetitionStats.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.trim.split("\\s+")
    val n = toks.length
    val distinct = new java.util.HashSet[String]()
    toks.foreach(distinct.add)
    val dupTokFrac = if (n == 0) 0.0 else (n - distinct.size).toDouble / n
    var topBigramFrac = 0.0
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Integer]()
      var mx = 0
      var i = 0
      while (i + 1 < n) {
        val bg = toks(i) + " " + toks(i + 1)
        val c = counts.merge(bg, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        if (c > mx) mx = c
        i += 1
      }
      topBigramFrac = mx.toDouble / (n - 1)
    }
    new GenericInternalRow(Array[Any](n, dupTokFrac, topBigramFrac))
  }
}

/** Native duplicated-span REMOVAL surgery (r11): given a document and the
  * start indices of its cross-doc-duplicated k-token windows, drop every
  * covered token and fingerprint the surviving text — the `cur_dedup_spans`
  * map kernel. Output `(_1 n_tokens, _2 n_removed, _3 clean_fp)` matches
  * the tuple UDF it replaces.
  *
  * NULL semantics are deliberately asymmetric (hence no `nullIntolerant`):
  * a null document is null out, but a null hot-window list means "no
  * duplicated windows" (the left-outer join's miss side) and must surgery
  * NOTHING AWAY, exactly like the UDF's `hotIs != null` guard.
  */
case class SpanSurgery(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k > 0, s"window size k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<int>), got ($l, $r)")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("_1", IntegerType, nullable = false),
    StructField("_2", IntegerType, nullable = false),
    StructField("_3", LongType, nullable = false)))
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "span_surgery_native"

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else {
      val his = right.eval(input)
      SpanSurgery.compute(t.asInstanceOf[UTF8String],
        if (his == null) null else his.asInstanceOf[ArrayData], k)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val helper = ctx.addReferenceObj("spanSurgeryHelper", SpanSurgery,
      SpanSurgery.getClass.getName)
    val resultCode =
      code"""
        ${leftGen.code}
        boolean ${ev.isNull} = ${leftGen.isNull};
        InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          ${rightGen.code}
          ${ev.value} = $helper.compute(${leftGen.value},
            ${rightGen.isNull} ? null : ${rightGen.value}, $k);
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanSurgery =
    copy(left = newLeft, right = newRight)
}

object SpanSurgery {
  def compute(text: UTF8String, hotIs: ArrayData, k: Int): InternalRow = {
    val toks = text.toString.trim.split("\\s+")
    val covered = new Array[Boolean](toks.length)
    if (hotIs != null) {
      val m = hotIs.numElements()
      var j = 0
      while (j < m) {
        val i0 = hotIs.getInt(j)
        var t = i0
        while (t < i0 + k && t < toks.length) { covered(t) = true; t += 1 }
        j += 1
      }
    }
    val kept = new java.lang.StringBuilder
    var removed = 0
    var i = 0
    while (i < toks.length) {
      if (covered(i)) removed += 1
      else {
        if (kept.length > 0) kept.append(' ')
        kept.append(toks(i))
      }
      i += 1
    }
    var h = 0L
    var c = 0
    while (c < kept.length) { h = (h * 31 + kept.charAt(c)) % HashPrime; c += 1 }
    new GenericInternalRow(Array[Any](toks.length, removed, h))
  }
}
