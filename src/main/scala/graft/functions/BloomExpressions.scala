package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a broadcast [[BloomFilter]] — the
  * decontamination prefilter's scale path (`cur_decontaminate_bloom`).
  *
  * Why it exists: the exact decontamination query broadcasts the benchmark
  * shingle set as a hash relation. That is the right plan while the set
  * fits a broadcast-hash join (~a few hundred MB); a 100-TB-era eval suite
  * can carry 10⁸–10⁹ distinct shingles, where the hash relation no longer
  * broadcasts but a 1%-FP Bloom filter still does at ~1.2 GB/10⁹ keys.
  * This expression makes the Bloom probe a scan-stage, codegen'd filter —
  * the exploded corpus never shuffles; only the tiny candidate set that
  * survives the probe reaches the exact (FP-killing) semi-join.
  *
  * Carries the filter as a `Broadcast` handle (not a SQL-expressible
  * argument), so it is constructed through `GraftColumnBridge` exactly
  * like [[CmsOrderedSort]]'s count-min sketch. The deserialized filter is
  * resolved from the broadcast ONCE per generated-class instance (codegen
  * mutable state) / once per task (transient lazy val on the interpreted
  * path) — NOT per row: `Broadcast.value` pays an assertValid + a
  * SoftReference read per call, and under memory pressure a cleared soft
  * reference would re-read the whole (≈GB at scale) filter block
  * mid-scan. Per-row work is then just `mightContainLong`'s two hash
  * probes against the bit array — no boxing, stays inside whole-stage
  * codegen (plan-audited in PlanAuditSpec's ScalaUDF-free list).
  *
  * False positives are BY DESIGN admitted here and removed by the exact
  * verify join downstream; a false negative is impossible for inserted
  * keys, so the composed query is pinned equal to the broadcast-semi-join
  * form (BloomExpressionsSpec + the shared `cur_decontaminate` oracle).
  */
case class BloomMightContainLong(child: Expression, filter: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long_native"

  @transient private lazy val localFilter: BloomFilter = filter.value

  override protected def nullSafeEval(input: Any): Any =
    localFilter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomFilterBc", filter,
      "org.apache.spark.broadcast.Broadcast")
    val localRef = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "graftBloomFilter",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bc.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $localRef.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
