package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.TextOps.HashPrime

/** Native tokenize → k-shingle → distinct in one codegen-fused pass
  * (r11): the map-stage front of the whole dedup family. Replaces the
  * per-doc `String => Array[String]` shingle UDF — output order is the
  * same first-appearance order (`LinkedHashSet` semantics), so every
  * downstream consumer (MinHash signatures, exact verify joins, the
  * streaming twin's batch comparisons) sees identical arrays.
  *
  * Tokenization is byte-identical to the UDF it replaces
  * (`text.trim.split("\\s+")` on the materialized string — a regex split
  * needs the `String`; the win is on the OUTPUT side, where the UDF paid
  * a catalyst→Scala converter per shingle, and in keeping the projection
  * inside whole-stage codegen). SQL form:
  * `shingle_strings_native(text, k)` with a foldable int k.
  */
case class ShingleStrings(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"shingle size k must be positive, got $k")

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings_native"

  override protected def nullSafeEval(input: Any): Any =
    ShingleStrings.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("shingleHelper", ShingleStrings,
      ShingleStrings.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

object ShingleStrings {
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < k) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + k <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var n = 0
      while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
      new GenericArrayData(out)
    }
  }
}

/** Native fused text → sorted distinct 60-bit k-shingle hashes (r11): the
  * `hashedShingleDocs` kernel under `dd_ngram_jaccard` / `dd_ppjoin` /
  * `dd_jac_components` and the curation pipeline. One compiled pass:
  * tokenize, then hash each k-token window directly off the token chars
  * (base-31 and base-131 polynomial folds packed into one long, single
  * space between tokens — char-identical to hashing the materialized
  * `"w1 w2 w3"` shingle string). No shingle string is ever allocated, and
  * unlike the `String => Array[Long]` UDF it replaces the output longs go
  * straight into an `UnsafeArrayData` with no converter pass. Sort+dedup
  * replaces `distinct.sorted` (same result, no boxing).
  *
  * Distinct-hash counts equal distinct-shingle counts unless two of a
  * corpus's shingles collide in the 60-bit space (P < 1e-6 below ~1e6
  * distinct shingles). SQL form: `hashed_shingles_native(text, k)`.
  */
case class HashedShingles(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"shingle size k must be positive, got $k")

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles_native"

  override protected def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("hashedShingleHelper", HashedShingles,
      HashedShingles.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** Native 60-bit hash over an ALREADY-shingled string array (r11): the
  * compatibility twin of [[HashedShingles]] for callers that hold shingle
  * strings (the `Dedup.jaccardPairs(shingled)` entry) — same packed
  * base-31/base-131 folds over each shingle's chars, sorted distinct
  * output. SQL form: `hash_shingle_array_native(shingles)`.
  */
case class HashShingleArray(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_shingle_array_native"

  override protected def nullSafeEval(input: Any): Any =
    HashShingleArray.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("hashShingleArrayHelper", HashShingleArray,
      HashShingleArray.getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $helper.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashShingleArray =
    copy(child = newChild)
}

object HashShingleArray {
  /** The library's 60-bit shingle hash of ONE shingle string — the packed
    * base-31/base-131 mod-(1e9+7) folds every hashed-shingle surface
    * (batch `hs` columns, their DuckDB oracle twins, and the streaming
    * minhash twin's compact state) shares. One implementation so the
    * representations can never drift.
    */
  def hashOne(s: String): Long = {
    var h1 = 0L; var h2 = 0L; var j = 0
    while (j < s.length) {
      val c = s.charAt(j).toLong
      h1 = (h1 * 31 + c) % HashPrime
      h2 = (h2 * 131 + c) % HashPrime
      j += 1
    }
    h1 * HashPrime + h2
  }

  /** Sorted distinct [[hashOne]] values of a shingle collection — the
    * Scala-side twin of [[compute]] for callers that hold plain strings
    * (the streaming minhash twin's per-doc state payload).
    */
  def hashDistinctSorted(sh: Seq[String]): Array[Long] = {
    val out = new Array[Long](sh.length)
    var i = 0
    sh.foreach { s => out(i) = hashOne(s); i += 1 }
    sortDistinctInPlace(out)
  }

  private def sortDistinctInPlace(out: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(out)
    var m = 0
    var r = 0
    while (r < out.length) {
      if (r == 0 || out(r) != out(r - 1)) { out(m) = out(r); m += 1 }
      r += 1
    }
    java.util.Arrays.copyOf(out, m)
  }

  /** Intersection cardinality of two sorted-distinct long arrays (the
    * [[SortedLongIntersectCount]] merge, over primitive arrays for
    * driver/state-side callers).
    */
  def sortedIntersectCount(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var j = 0; var c = 0L
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): UnsafeArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = hashOne(arr.getUTF8String(i).toString)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sortDistinctInPlace(out))
  }
}

/** Native order-preserving token n-grams WITH duplicates (r11): every
  * stride-1 window of `n` whitespace tokens, space-joined — the per-doc
  * front of the corpus heavy-hitters query (`tx_top_ngrams`), where the
  * count of each occurrence matters so [[ShingleStrings]]' distinct
  * semantics don't apply. Replaces the per-doc bigram UDF.
  * SQL form: `token_ngrams_native(text, n)`.
  */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"ngram size n must be positive, got $n")

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_ngrams_native"

  override protected def nullSafeEval(input: Any): Any =
    TokenNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("ngramHelper", TokenNgrams,
      TokenNgrams.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

object TokenNgrams {
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Native rolling k-token window hashes (r11): for every stride-1 window
  * of `k` whitespace tokens, the base-31 polynomial hash of the
  * space-joined window string — the substring-level dedup signal under
  * `dd_dup_windows` / `dd_maximal_spans` / `cur_dedup_spans` (the
  * window-posting seam's per-doc map stage). TRUE rolling computation
  * exactly as the UDF it replaces: one pass builds prefix hashes and
  * powers of the joined string, then each window is
  * `(H[e] − H[s]·31^(e−s)) mod p` — O(total chars) per document and
  * bit-identical to hashing each window string separately (the oracle's
  * form). Docs with fewer than k tokens produce no windows.
  * SQL form: `window_hashes_native(text, k)`.
  */
case class WindowHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"window size k must be positive, got $k")

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes_native"

  override protected def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("windowHashHelper", WindowHashes,
      WindowHashes.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  def compute(text: UTF8String, k: Int): UnsafeArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < k) UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    else {
      val joined = toks.mkString(" ")
      // roll per CODEPOINT, in lockstep with PolyHash's r13 codepoint
      // fold — the bit-identical-to-polyHash(window-string) contract must
      // hold on any text, and offsets/powers must therefore be in
      // codepoint units, not UTF-16 units
      val cps = joined.codePoints().toArray
      val n = cps.length
      val prefix = new Array[Long](n + 1)
      val pow = new Array[Long](n + 1)
      pow(0) = 1L
      var i = 0
      while (i < n) {
        prefix(i + 1) = (prefix(i) * 31 + cps(i)) % HashPrime
        pow(i + 1) = (pow(i) * 31) % HashPrime
        i += 1
      }
      val starts = new Array[Int](toks.length)
      var t = 1
      while (t < toks.length) {
        starts(t) = starts(t - 1) +
          toks(t - 1).codePointCount(0, toks(t - 1).length) + 1
        t += 1
      }
      val out = new Array[Long](toks.length - k + 1)
      var w = 0
      while (w < out.length) {
        val s0 = starts(w)
        val e0 = if (w + k < toks.length) starts(w + k) - 1 else n
        val h = (prefix(e0) - prefix(s0) * pow(e0 - s0)) % HashPrime
        out(w) = if (h < 0) h + HashPrime else h
        w += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }
}

object HashedShingles {
  def compute(text: UTF8String, k: Int): UnsafeArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < k) UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    else {
      val out = new Array[Long](toks.length - k + 1)
      var i = 0
      while (i + k <= toks.length) {
        var h1 = 0L; var h2 = 0L; var w = 0
        while (w < k) {
          if (w > 0) { h1 = (h1 * 31 + 32) % HashPrime; h2 = (h2 * 131 + 32) % HashPrime }
          val t = toks(i + w); var j = 0
          while (j < t.length) {
            val c = t.charAt(j).toLong
            h1 = (h1 * 31 + c) % HashPrime
            h2 = (h2 * 131 + c) % HashPrime
            j += 1
          }
          w += 1
        }
        out(i) = h1 * HashPrime + h2
        i += 1
      }
      // sort + in-place dedup == distinct.sorted, without boxing
      java.util.Arrays.sort(out)
      var n = 0
      var r = 0
      while (r < out.length) {
        if (r == 0 || out(r) != out(r - 1)) { out(n) = out(r); n += 1 }
        r += 1
      }
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, n))
    }
  }
}
