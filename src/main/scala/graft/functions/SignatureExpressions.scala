package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native per-document MinHash signature: H affine-permutation minima over
  * the polynomial hashes of a document's shingle set — the full-corpus
  * map-stage kernel of `dd_minhash_lsh` and the r10 verdict's #1 headroom
  * item. Replaces a `Seq[String]` Scala UDF that boxed every shingle
  * through catalyst→Scala converters and kept the signature projection out
  * of whole-stage codegen; this expression reads `ArrayData.getUTF8String`
  * and hashes ASCII shingles directly from their UTF-8 bytes (identical to
  * the `String.charAt` fold for code points < 128; non-ASCII shingles take
  * a `toString` fallback so the value is bit-identical to the UDF it
  * replaced — pinned by `MinhashSignatureExpressionSpec`).
  *
  * Arithmetic is exactly [[graft.text.Dedup.minhashSigOf]] (which now
  * delegates to [[MinhashSignature.computeStrings]] — one source of truth
  * shared with the streaming twin): shingle hash `h = (h*31 + c) mod P`,
  * permutation `v = (h*a_i + b_i) mod P`, empty sets → all-sentinel `P`.
  * `numHashes` must be a foldable int in the SQL form
  * (`minhash_signature_native(shingles, 32)`).
  */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature_native"

  @transient private lazy val params: Array[Long] =
    MinhashSignature.packedParams(numHashes)

  override protected def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], params)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("minhashHelper", MinhashSignature,
      MinhashSignature.getClass.getName)
    val p = ctx.addReferenceObj("minhashParams", params, "long[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $helper.compute($arr, $p);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  import graft.text.TextOps.HashPrime

  /** Affine permutation parameters for H minhash functions, packed as
    * `[a0, b0, a1, b1, ...]` — the same constants `Dedup.hashParams`
    * produced since round 4 (kept bit-stable: every committed signature,
    * stream checkpoint, and oracle pin depends on them).
    */
  def packedParams(numHashes: Int): Array[Long] = {
    val out = new Array[Long](2 * numHashes)
    var i = 0
    while (i < numHashes) {
      out(2 * i) = ((2L * i + 1) * 2654435761L) % HashPrime
      out(2 * i + 1) = (i * 40503L * 2654435789L + 17) % HashPrime
      i += 1
    }
    out
  }

  /** Codegen/interpreted kernel: signature of one shingle array. ASCII
    * shingles hash straight from UTF-8 bytes (no String allocation); any
    * byte ≥ 0x80 falls back to the `String.charAt` fold so non-ASCII
    * shingles hash identically to the Scala path.
    */
  def compute(arr: ArrayData, params: Array[Long]): UnsafeArrayData = {
    val h2 = params.length / 2
    val sig = new Array[Long](h2)
    java.util.Arrays.fill(sig, HashPrime)
    val n = arr.numElements()
    var s = 0
    while (s < n) {
      val u = arr.getUTF8String(s)
      var h = 0L
      val bytes = u.getBytes
      var ascii = true
      var i = 0
      while (ascii && i < bytes.length) {
        val b = bytes(i)
        if (b < 0) ascii = false
        else { h = (h * 31 + b) % HashPrime; i += 1 }
      }
      if (!ascii) {
        h = 0L
        val str = u.toString
        var j = 0
        while (j < str.length) { h = (h * 31 + str.charAt(j)) % HashPrime; j += 1 }
      }
      var p = 0
      while (p < h2) {
        val v = (h * params(2 * p) + params(2 * p + 1)) % HashPrime
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Scala-side twin over materialized strings (the streaming
    * `mapGroupsWithState` path, which never sees `ArrayData`). Same
    * arithmetic, same constants.
    */
  def computeStrings(sh: Seq[String], numHashes: Int): Array[Long] = {
    val params = packedParams(numHashes)
    val sig = Array.fill(numHashes)(HashPrime)
    sh.foreach { s =>
      var h = 0L
      var i = 0
      while (i < s.length) { h = (h * 31 + s.charAt(i)) % HashPrime; i += 1 }
      var p = 0
      while (p < numHashes) {
        val v = (h * params(2 * p) + params(2 * p + 1)) % HashPrime
        if (v < sig(p)) sig(p) = v
        p += 1
      }
    }
    sig
  }
}

/** Native hyperplane-LSH bit signature: bit p = sign(v · plane_{offset+p})
  * over [[graft.ann.Ann.planeComponent]]'s deterministic plane matrix — the
  * full-corpus map-stage kernel of `ann_lsh_topk` (the other half of the
  * r10 verdict's headroom item). Replaces a `Seq[Float]` UDF that boxed
  * every vector component per row; reads `ArrayData.getFloat` directly and
  * fuses into whole-stage codegen. Vectors shorter than `dim` throw (the
  * UDF failed loud too, via IndexOutOfBounds); extra trailing components
  * are ignored, matching the UDF's `j < dim` loop.
  *
  * SQL form: `hyperplane_signature_native(vec, dim, numPlanes, planeOffset)`
  * with three foldable ints.
  */
case class HyperplaneSignature(
    child: Expression, dim: Int, numPlanes: Int, planeOffset: Int)
    extends UnaryExpression {

  require(dim > 0 && numPlanes > 0 && numPlanes <= 64 && planeOffset >= 0,
    s"invalid hyperplane params: dim=$dim numPlanes=$numPlanes offset=$planeOffset")

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_signature_native"

  @transient private lazy val planes: Array[Double] =
    HyperplaneSignature.planesFlat(dim, numPlanes, planeOffset)

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSignature.compute(input.asInstanceOf[ArrayData], planes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("hyperplaneHelper", HyperplaneSignature,
      HyperplaneSignature.getClass.getName)
    val p = ctx.addReferenceObj("hyperplanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $helper.compute($arr, $p, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** Flat row-major `numPlanes × dim` plane matrix from the shared
    * deterministic component function (the same values the DuckDB oracle
    * embeds as literals).
    */
  def planesFlat(dim: Int, numPlanes: Int, planeOffset: Int): Array[Double] = {
    val out = new Array[Double](numPlanes * dim)
    var p = 0
    while (p < numPlanes) {
      var j = 0
      while (j < dim) {
        out(p * dim + j) = graft.ann.Ann.planeComponent(planeOffset + p, j)
        j += 1
      }
      p += 1
    }
    out
  }

  def compute(arr: ArrayData, planes: Array[Double], dim: Int): Long = {
    if (arr.numElements() < dim) throw new IllegalArgumentException(
      s"hyperplane_signature_native: vector has ${arr.numElements()} components, " +
        s"expected at least $dim (ragged embedding row)")
    val numPlanes = planes.length / dim
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      val base = p * dim
      var j = 0
      while (j < dim) { dot += arr.getFloat(j).toDouble * planes(base + j); j += 1 }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** Native 60-bit SimHash over distinct whitespace tokens (r11, completing
  * the no-boxed-UDF sweep of the dedup map paths): two 30-bit polynomial
  * hashes (bases 31/131) supply the bit pool; bit b of the signature is
  * set iff the token-majority vote for that bit is positive. Pure integer
  * arithmetic — bit-identical in any engine (the DuckDB oracle computes
  * the same fold in SQL). Replaces the per-doc `String => Long` UDF under
  * `dd_simhash` / `dd_hamming` / `dd_sim_components`; the Catalyst-HOF
  * twin (`Dedup.simhashSpec`) stays as the executable spec.
  *
  * SQL form: `simhash_native(text)`.
  */
case class Simhash(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_native"

  override protected def nullSafeEval(input: Any): Any =
    Simhash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("simhashHelper", Simhash, Simhash.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash =
    copy(child = newChild)
}

object Simhash {
  import graft.text.TextOps.HashPrime

  def compute(text: UTF8String): Long = {
    val toks = new java.util.LinkedHashSet[String]()
    text.toString.trim.split("\\s+").foreach(toks.add)
    val votes = new Array[Int](60)
    val it = toks.iterator()
    while (it.hasNext) {
      val t = it.next()
      var h1 = 0L
      var h2 = 0L
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i).toLong
        h1 = (h1 * 31 + c) % HashPrime
        h2 = (h2 * 131 + c) % HashPrime
        i += 1
      }
      var b = 0
      while (b < 30) {
        votes(b) += (if (((h1 >> b) & 1L) == 1L) 1 else -1)
        votes(b + 30) += (if (((h2 >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** Native CMS-ordered shingle sort — the last boxed stage of the production
  * PPJoin path (`Dedup.cmsOrdered`, r11 verdict ask #2): sorts an
  * `array<bigint>` of shingle hashes by (count-min-sketch estimated
  * document frequency, hash). The Scala UDF it replaces boxed the whole
  * `Seq[Long]` AND allocated a `(Long, Long)` tuple per element for
  * `sortBy`; this expression reads `ArrayData.getLong` into a primitive
  * array and runs a dual-array quicksort — the only remaining allocation is one
  * boxed Long per `estimateCount` call (the public sketch API takes
  * `Object`).
  *
  * The sketch rides a [[Broadcast]] handle (2.6 MB ships once per executor,
  * as before) — which is why this expression is constructed via
  * [[org.apache.spark.sql.graft.GraftColumnBridge]] rather than the
  * function registry: a broadcast is not expressible as a SQL argument.
  * Estimates only steer the ORDER (never a value), so exactness is
  * untouched; the order is the same deterministic total order the UDF
  * produced (pinned by `CmsOrderedSortExpressionSpec`).
  */
case class CmsOrderedSort(child: Expression, sketch: Broadcast[CountMinSketch])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_ordered_sort_native"

  override protected def nullSafeEval(input: Any): Any =
    CmsOrderedSort.sortByEstimate(input.asInstanceOf[ArrayData], sketch)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("cmsSortHelper", CmsOrderedSort,
      CmsOrderedSort.getClass.getName)
    val bc = ctx.addReferenceObj("cmsSketch", sketch,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $helper.sortByEstimate($arr, $bc);")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsOrderedSort =
    copy(child = newChild)
}

object CmsOrderedSort {
  def sortByEstimate(arr: ArrayData, bc: Broadcast[CountMinSketch]): UnsafeArrayData = {
    val sketch = bc.value
    val n = arr.numElements()
    val hs = new Array[Long](n)
    val est = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      hs(i) = h
      est(i) = sketch.estimateCount(java.lang.Long.valueOf(h))
      i += 1
    }
    sortPairs(est, hs, 0, n - 1)
    UnsafeArrayData.fromPrimitiveArray(hs)
  }

  /** In-place quicksort of the parallel arrays by (est, hs) ascending —
    * median-of-three pivot, insertion sort under 16, recursion on the
    * smaller half only (stack depth O(log n) even on adversarial input).
    */
  private[functions] def sortPairs(est: Array[Long], hs: Array[Long], lo0: Int, hi0: Int): Unit = {
    var lo = lo0
    var hi = hi0
    while (hi - lo >= 16) {
      val mid = lo + (hi - lo) / 2
      // median-of-three into `mid`
      if (less(est, hs, mid, lo)) swap(est, hs, lo, mid)
      if (less(est, hs, hi, mid)) {
        swap(est, hs, mid, hi)
        if (less(est, hs, mid, lo)) swap(est, hs, lo, mid)
      }
      val pe = est(mid); val ph = hs(mid)
      var i = lo; var j = hi
      while (i <= j) {
        while (est(i) < pe || (est(i) == pe && hs(i) < ph)) i += 1
        while (est(j) > pe || (est(j) == pe && hs(j) > ph)) j -= 1
        if (i <= j) { swap(est, hs, i, j); i += 1; j -= 1 }
      }
      if (j - lo < hi - i) { sortPairs(est, hs, lo, j); lo = i }
      else { sortPairs(est, hs, i, hi); hi = j }
    }
    // insertion sort for the short tail
    var k = lo + 1
    while (k <= hi) {
      val ke = est(k); val kh = hs(k)
      var m = k - 1
      while (m >= lo && (est(m) > ke || (est(m) == ke && hs(m) > kh))) {
        est(m + 1) = est(m); hs(m + 1) = hs(m); m -= 1
      }
      est(m + 1) = ke; hs(m + 1) = kh
      k += 1
    }
  }

  @inline private def less(est: Array[Long], hs: Array[Long], a: Int, b: Int): Boolean =
    est(a) < est(b) || (est(a) == est(b) && hs(a) < hs(b))

  @inline private def swap(est: Array[Long], hs: Array[Long], a: Int, b: Int): Unit = {
    val te = est(a); est(a) = est(b); est(b) = te
    val th = hs(a); hs(a) = hs(b); hs(b) = th
  }
}
