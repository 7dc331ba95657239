package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE document encoder: whitespace-split the text, greedy
  * lowest-rank-first merge each word against the trained rank table, emit
  * the concatenated subword tokens — the full-corpus map stage of
  * `tx_bpe_encode`, in one codegen kernel (no boxed UDF, no intermediate
  * tokens array materialized between split and merge).
  *
  * The merge table rides the expression itself (a few KB of strings — the
  * whole-plan serialization ships it once per executor), which is why the
  * column is constructed via [[org.apache.spark.sql.graft.GraftColumnBridge]]
  * rather than the function registry: a trained merge list is not
  * expressible as a SQL argument. Per-expression-instance, per-executor,
  * each distinct word's merge loop runs ONCE and is memoized (bounded
  * [[ConcurrentHashMap]]); word frequency is Zipfian, so steady-state
  * encoding is a memo lookup per word.
  *
  * Semantics pinned bit-identical to the independent textbook
  * implementation [[graft.text.Bpe.referenceEncodeDoc]] by
  * `BpeSpec` (and, transitively, by the `tx_bpe_encode` DuckDB gate,
  * whose word→tokens dim the reference path builds): ASCII-space-only
  * trim then `\s+` split (the `tokensSql` contract every text gate
  * shares), empty words skipped, per-word greedy fuse-all-occurrences
  * left-to-right.
  */
case class BpeEncodeTokens(child: Expression, merges: Array[Array[String]])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_native"

  @transient private lazy val table: BpeEncodeTokens.RankTable =
    BpeEncodeTokens.buildTable(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeEncodeTokens.encodeDoc(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("bpeHelper", BpeEncodeTokens,
      BpeEncodeTokens.getClass.getName)
    val t = ctx.addReferenceObj("bpeRanks", table,
      classOf[BpeEncodeTokens.RankTable].getName)
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = $helper.encodeDoc($str, $t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeTokens =
    copy(child = newChild)
}

object BpeEncodeTokens {

  /** Pair-rank lookup — a nested map keyed (left -> right -> rank), so no
    * separator character is needed at all: any pair of symbol strings is a
    * distinct key, where a concatenated-string key would collide whenever a
    * symbol itself contains the separator. Also zero-allocation on the
    * probe path (two map gets, no per-pair concat). Plus the per-executor
    * word memo. One instance per expression per executor (rebuilt from the
    * serialized merge array by the transient lazy).
    */
  final class RankTable(
      val ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]])
      extends Serializable {
    @transient lazy val memo = new ConcurrentHashMap[String, Array[UTF8String]]()
  }

  private[graft] val MemoCap = 65536

  // JVM-wide memo telemetry (r12 envelope row): LongAdder keeps the hot
  // path at a striped non-contended increment; local-mode runs (the bench
  // envelope) read totals directly, cluster deployments would surface the
  // same counters per executor via the metrics system. Memo size is
  // reported as successful PUTS (one per distinct word per encoding
  // table, minus cap rejections) — counters survive the tables
  // themselves, where a weak-reference registry read -1 whenever GC beat
  // the reader to the task-side instances.
  private val memoHits = new java.util.concurrent.atomic.LongAdder
  private val memoMisses = new java.util.concurrent.atomic.LongAdder
  private val memoPuts = new java.util.concurrent.atomic.LongAdder

  def resetMemoStats(): Unit = {
    memoHits.reset(); memoMisses.reset(); memoPuts.reset()
  }

  /** (hits, misses, successful memo puts) since the last reset. A put
    * deficit vs misses means the MemoCap bound engaged.
    */
  def memoStats(): (Long, Long, Long) = (memoHits.sum(), memoMisses.sum(), memoPuts.sum())

  def buildTable(merges: Array[Array[String]]): RankTable = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]](
      merges.length * 2)
    var i = 0
    while (i < merges.length) {
      var inner = m.get(merges(i)(0))
      if (inner == null) {
        inner = new java.util.HashMap[String, Integer](4)
        m.put(merges(i)(0), inner)
      }
      // earliest rank wins if a trained list ever repeats a pair
      if (!inner.containsKey(merges(i)(1))) {
        inner.put(merges(i)(1), Integer.valueOf(i))
      }
      i += 1
    }
    new RankTable(m)
  }

  /** Kernel: one document → its BPE token array. */
  def encodeDoc(text: UTF8String, table: RankTable): GenericArrayData = {
    // ASCII-space-only trim, matching Spark `trim(text)` / DuckDB
    // `trim(text)` — NOT java.lang.String#trim (which also strips
    // controls); the tokensSql parity every text gate shares depends on it
    val s = text.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val t = s.substring(lo, hi)
    if (t.isEmpty) return new GenericArrayData(new Array[Any](0))
    val words = t.split("\\s+")
    val out = new java.util.ArrayList[Any](words.length * 2)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        var toks = table.memo.get(word)
        if (toks == null) {
          memoMisses.increment()
          toks = encodeWord(word, table.ranks)
          // putIfAbsent: concurrent misses of the same hot word count ONE
          // put (the entry), so puts == live entries exactly; the cap
          // check stays a soft bound (overshoot ≤ thread count)
          if (table.memo.size < MemoCap &&
              table.memo.putIfAbsent(word, toks) == null) {
            memoPuts.increment()
          }
        } else memoHits.increment()
        var i = 0
        while (i < toks.length) { out.add(toks(i)); i += 1 }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Greedy lowest-rank-first merge of one word (array shape: scan for the
    * minimum-rank adjacent pair, fuse all its occurrences left-to-right,
    * repeat). Independent of [[graft.text.Bpe.referenceEncodeWord]]'s
    * list shape on purpose — the two are differential-pinned.
    */
  def encodeWord(word: String,
      ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]])
      : Array[UTF8String] = {
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var done = syms.length < 2
    while (!done) {
      var bestRank = Integer.MAX_VALUE
      var bestL: String = null
      var bestR: String = null
      var j = 0
      while (j < syms.length - 1) {
        val inner = ranks.get(syms(j))
        val r = if (inner == null) null else inner.get(syms(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestL = syms(j); bestR = syms(j + 1)
        }
        j += 1
      }
      if (bestL == null) done = true
      else {
        val fused = new java.util.ArrayList[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == bestL && syms(k + 1) == bestR) {
            fused.add(syms(k) + syms(k + 1)); k += 2
          } else { fused.add(syms(k)); k += 1 }
        }
        syms = fused.toArray(new Array[String](fused.size))
        if (syms.length < 2) done = true
      }
    }
    val out = new Array[UTF8String](syms.length)
    var o = 0
    while (o < syms.length) { out(o) = UTF8String.fromString(syms(o)); o += 1 }
    out
  }
}
