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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** Extract a foldable int argument at function-resolution time (the SQL
    * forms of the signature kernels take literal config ints — a
    * non-foldable argument is a user error, failed loud with the offending
    * expression in the message).
    */
  private def foldInt(fn: String, arg: String)(e: Expression): Int =
    if (e.foldable) e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal INT, got $other")
    } else throw new IllegalArgumentException(
      s"$fn: $arg must be a foldable literal, got $e")

  // builders are STABLE vals shared by the extension injection, the
  // session-level register() below, and its already-ours check — reference
  // identity is the registration tag
  private val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("direct_similarity_native", classOf[DirectSimilarity].getName,
      children => DirectSimilarity(children(0), children(1))),
    ("consistency_similarity_native", classOf[ConsistencySimilarity].getName,
      children => ConsistencySimilarity(children(0), children(1), children(2))),
    ("text_edit_similarity_native", classOf[TextEditSimilarity].getName,
      children => TextEditSimilarity(children(0), children(1))),
    ("sorted_long_intersect_count", classOf[SortedLongIntersectCount].getName,
      children => SortedLongIntersectCount(children(0), children(1))),
    ("double_array_dot_native", classOf[DoubleArrayDot].getName,
      children => DoubleArrayDot(children(0), children(1))),
    ("pq_adc_native", classOf[PqAdc].getName,
      children => PqAdc(children(0), children(1), children(2),
        foldInt("pq_adc_native", "ks")(children(3)))),
    ("minhash_signature_native", classOf[MinhashSignature].getName,
      children => MinhashSignature(children(0),
        foldInt("minhash_signature_native", "numHashes")(children(1)))),
    ("hyperplane_signature_native", classOf[HyperplaneSignature].getName,
      children => HyperplaneSignature(children(0),
        foldInt("hyperplane_signature_native", "dim")(children(1)),
        foldInt("hyperplane_signature_native", "numPlanes")(children(2)),
        foldInt("hyperplane_signature_native", "planeOffset")(children(3)))),
    ("shingle_strings_native", classOf[ShingleStrings].getName,
      children => ShingleStrings(children(0),
        foldInt("shingle_strings_native", "k")(children(1)))),
    ("hashed_shingles_native", classOf[HashedShingles].getName,
      children => HashedShingles(children(0),
        foldInt("hashed_shingles_native", "k")(children(1)))),
    ("simhash_native", classOf[Simhash].getName,
      children => Simhash(children(0))),
    ("token_ngrams_native", classOf[TokenNgrams].getName,
      children => TokenNgrams(children(0),
        foldInt("token_ngrams_native", "n")(children(1)))),
    ("window_hashes_native", classOf[WindowHashes].getName,
      children => WindowHashes(children(0),
        foldInt("window_hashes_native", "k")(children(1)))),
    ("hash_shingle_array_native", classOf[HashShingleArray].getName,
      children => HashShingleArray(children(0))),
    ("repetition_stats_native", classOf[RepetitionStats].getName,
      children => RepetitionStats(children(0))),
    ("span_surgery_native", classOf[SpanSurgery].getName,
      children => SpanSurgery(children(0), children(1),
        foldInt("span_surgery_native", "k")(children(2)))))

  private val descriptors = builders.map { case (name, className, builder) =>
    (FunctionIdentifier(name), new ExpressionInfo(className, name), builder)
  }

  /** Register on a live session (same builder vals the extension injects).
    * Idempotent AND quiet: library entry points (Dedup verify, every Ann
    * DataFrame builder) call this on each plan construction, so a name
    * already bound to OUR builder (reference identity — the vals above) is
    * skipped without the "function replaced" WARN. A name bound to a
    * FOREIGN builder (user-registered or stale) is replaced, not silently
    * kept: resolving a kernel name to someone else's implementation is the
    * failure mode, and the one-time WARN on reclaim is then informative.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, builder) =>
      val id = FunctionIdentifier(name)
      val alreadyOurs = reg.lookupFunctionBuilder(id).exists(_ eq builder)
      if (!alreadyOurs) reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
