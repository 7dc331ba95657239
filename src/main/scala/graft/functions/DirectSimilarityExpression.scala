package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the X1 direct-match kernel: positional
  * wobble-aware match count of `gene` against `window` (aligned at 0) —
  * the codegen tier of SURVEY §7.3's preference ladder (native Expression
  * > Scala UDF). `doGenCode` emits a branch-light byte loop that fuses
  * into whole-stage codegen: no UDF call overhead, no String
  * materialization, null-safety handled by the framework.
  *
  * Semantics identical to [[graft.bio.SimilarityKernels.directScore]] for
  * windows at least as long as the gene (asserted by differential tests);
  * shorter windows score over the common prefix instead of throwing.
  */
case class DirectSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "direct_similarity_native"

  override protected def nullSafeEval(gene: Any, window: Any): Any = {
    val g = gene.asInstanceOf[UTF8String].getBytes
    val w = window.asInstanceOf[UTF8String].getBytes
    var score = 0.0
    var i = 0
    val n = math.min(g.length, w.length)
    while (i < n) {
      val a = g(i); val b = w(i)
      if (a == b || (a == 'c' && b == 't')) score += 1
      i += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, w) => {
      val gb = ctx.freshName("geneBytes")
      val wb = ctx.freshName("windowBytes")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |byte[] $gb = $g.getBytes();
         |byte[] $wb = $w.getBytes();
         |int $n = java.lang.Math.min($gb.length, $wb.length);
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  byte a = $gb[$i];
         |  byte b = $wb[$i];
         |  if (a == b || (a == (byte) 'c' && b == (byte) 't')) ${ev.value}Acc += 1.0;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DirectSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the native kernel functions —
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or call
  * [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.directSimilarityDescriptor)
    ext.injectFunction(GraftExtensions.consistencySimilarityDescriptor)
    ext.injectFunction(GraftExtensions.textEditSimilarityDescriptor)
    ext.injectFunction(GraftExtensions.sortedLongIntersectCountDescriptor)
    ext.injectFunction(GraftExtensions.doubleArrayDotDescriptor)
  }
}

object GraftExtensions {
  private val directSimilarityDescriptor = (
    FunctionIdentifier("direct_similarity_native"),
    new ExpressionInfo(classOf[DirectSimilarity].getName, "direct_similarity_native"),
    (children: Seq[Expression]) => DirectSimilarity(children(0), children(1)))

  private val consistencySimilarityDescriptor = (
    FunctionIdentifier("consistency_similarity_native"),
    new ExpressionInfo(classOf[ConsistencySimilarity].getName, "consistency_similarity_native"),
    (children: Seq[Expression]) => ConsistencySimilarity(children(0), children(1), children(2)))

  private val textEditSimilarityDescriptor = (
    FunctionIdentifier("text_edit_similarity_native"),
    new ExpressionInfo(classOf[TextEditSimilarity].getName, "text_edit_similarity_native"),
    (children: Seq[Expression]) => TextEditSimilarity(children(0), children(1)))

  private val sortedLongIntersectCountDescriptor = (
    FunctionIdentifier("sorted_long_intersect_count"),
    new ExpressionInfo(classOf[SortedLongIntersectCount].getName, "sorted_long_intersect_count"),
    (children: Seq[Expression]) => SortedLongIntersectCount(children(0), children(1)))

  private val doubleArrayDotDescriptor = (
    FunctionIdentifier("double_array_dot_native"),
    new ExpressionInfo(classOf[DoubleArrayDot].getName, "double_array_dot_native"),
    (children: Seq[Expression]) => DoubleArrayDot(children(0), children(1)))

  /** Register on a live session (same builder the extension uses).
    * Idempotent AND quiet: library entry points (Dedup verify, every Ann
    * DataFrame builder) call this on each plan construction, and a
    * replace-always registration would log a
    * "function replaced a previously registered function" WARN per kernel
    * per query — skip names that are already present instead.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def ensure(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    ensure("direct_similarity_native",
      children => DirectSimilarity(children(0), children(1)))
    ensure("consistency_similarity_native",
      children => ConsistencySimilarity(children(0), children(1), children(2)))
    ensure("text_edit_similarity_native",
      children => TextEditSimilarity(children(0), children(1)))
    ensure("sorted_long_intersect_count",
      children => SortedLongIntersectCount(children(0), children(1)))
    ensure("double_array_dot_native",
      children => DoubleArrayDot(children(0), children(1)))
  }
}
