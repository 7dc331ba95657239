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
    // fingerprint via the shared PolyHash kernel (per-codepoint fold) so
    // the clean_fp stays bit-identical to polyHash(clean_text) everywhere
    val h = PolyHash.compute(kept.toString, 31)
    new GenericInternalRow(Array[Any](toks.length, removed, h))
  }
}

/** Native polynomial string fingerprint: `h = (h·base + codepoint) mod p`,
  * p = [[graft.text.TextOps.HashPrime]] — the compiled form of
  * `TextOps.polyHashSpec`'s Catalyst-HOF fold (split-per-char → ascii →
  * aggregate with a pmod per character, which evaluates INTERPRETED per
  * char and dominated the `tx_fingerprint` / `cur_pii_redact` map stages
  * once the bench measured full materialization). Folds CODEPOINTS —
  * Spark's and DuckDB's ascii() both return the codepoint — so kernel,
  * HOF spec, and oracle agree on ANY text, non-BMP included (r13; the
  * prior UTF-16-unit fold diverged on supplementary characters) —
  * asserted by differential in TextOpsSpec. SQL mirror: the gate
  * oracles' shared `polyHashSql` CTE.
  */
/** Shared tokenization for the native text kernels — ONE home for the
  * Spark-parity subtleties every kernel must agree on: ASCII-space-only
  * trim (Spark `trim`, never String#trim which also strips controls) and
  * `\\s+` split with limit −1 (Spark keeps trailing empty strings, so an
  * empty document has ONE empty token). A kernel that hand-rolled these
  * separately could silently desynchronize from its Column spec.
  */
private[functions] object TextKernelUtil {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def asciiTrimSplit(s: String): Array[String] = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    Ws.split(s.subSequence(lo, hi), -1)
  }

  def countIn(words: Array[String], set: java.util.HashSet[String]): Int = {
    var hits = 0
    var w = 0
    while (w < words.length) {
      if (set.contains(words(w))) hits += 1
      w += 1
    }
    hits
  }
}

case class PolyHash(child: Expression, base: Int) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash_native"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String], base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("polyHashHelper", PolyHash,
      PolyHash.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t, $base);")
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  def compute(text: UTF8String, base: Int): Long = compute(text.toString, base)

  def compute(s: String, base: Int): Long = {
    // fold per CODEPOINT (r13 ADVICE fix): Spark's ascii() and DuckDB's
    // ascii() both return the codepoint, so folding UTF-16 units here
    // silently diverged from BOTH the HOF spec and the oracle on
    // supplementary characters; per-codepoint gives three-way parity on
    // any text (identical on BMP: charAt == codePointAt there)
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % HashPrime
      i += Character.charCount(cp)
    }
    h
  }
}

/** Native language-ID kernel: one pass per document — lowercase, ASCII-
  * space trim, whitespace split, count stopword hits against the four
  * static [[graft.text.TextOps.langProfiles]], argmax with ties to the
  * alphabetically-first profile, zero hits → "unknown". The compiled form
  * of `TextOps.langIdSpec`, whose per-language Catalyst HOF filters
  * evaluate an interpreted array_contains per token per language (the
  * hottest remaining map gate once the bench measured full
  * materialization). Differential-pinned in TextOpsSpec; the gate oracle
  * replicates the HOF form in SQL, so the DuckDB hash gate transitively
  * pins this kernel too.
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id_native"

  override protected def nullSafeEval(input: Any): Any =
    LangId.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("langIdHelper", LangId, LangId.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {
  private val names: Array[UTF8String] =
    graft.text.TextOps.langProfiles.map(p => UTF8String.fromString(p._1)).toArray
  private val sets: Array[java.util.HashSet[String]] =
    graft.text.TextOps.langProfiles.map { case (_, words) =>
      val s = new java.util.HashSet[String](words.size * 2)
      words.foreach(s.add)
      s
    }.toArray
  private val Unknown = UTF8String.fromString("unknown")

  def compute(text: UTF8String): UTF8String = {
    // lower() first (the spec's order), then the ASCII-space-only trim +
    // \s+ split every text gate shares. Java's split drops trailing empty
    // strings where Spark's keeps them — indistinguishable here, since an
    // empty token can never hit a stopword profile.
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val words = TextKernelUtil.asciiTrimSplit(s)
    val counts = new Array[Int](sets.length)
    var l = 0
    while (l < sets.length) {
      counts(l) = TextKernelUtil.countIn(words, sets(l))
      l += 1
    }
    var best = 0
    var i = 1
    while (i < counts.length) { if (counts(i) > counts(best)) best = i; i += 1 }
    if (counts(best) <= 0) Unknown else names(best)
  }
}

/** Native quality-score kernel: the length-saturation + stopword-ratio +
  * alphabetic-ratio heuristic in one compiled pass — the compiled form of
  * `TextOps.qualityScoreSpec`, whose HOF stopword filter evaluates an
  * interpreted array_contains per token (this score feeds five gates, so
  * the interpreted cost repeated). The arithmetic replicates the spec's
  * IEEE tree exactly: (0.4·min(n/200,1) + 0.3·stop) + 0.3·alpha, then the
  * tie-proof floor(x·1e4+0.5)/1e4 — and the token count replicates
  * Spark's split semantics (limit −1: trailing empty strings COUNT, so an
  * empty document has one token, exactly like `size(split(trim(text),
  * '\s+'))`). Differential-pinned in TextOpsSpec; every gate oracle
  * replicates the spec form in SQL, so the DuckDB hash gates transitively
  * pin this kernel.
  */
case class QualityScore(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score_native"

  // Seq, not Array: case-class equality on the parameter must be
  // structural so two separately-built but identical expressions
  // canonicalize together (subexpression elimination across columns)
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    QualityScore.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("qualityHelper", QualityScore,
      QualityScore.getClass.getName)
    val set = ctx.addReferenceObj("qualityStops", stopSet,
      classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t, $set);")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityScore =
    copy(child = newChild)
}

object QualityScore {
  def compute(text: UTF8String, stops: java.util.HashSet[String]): Double = {
    val s = text.toString
    val words = TextKernelUtil.asciiTrimSplit(s)
    val nTokens = words.length
    val hits = TextKernelUtil.countIn(words, stops)
    // iterate CODEPOINTS, not UTF-16 units: the spec's `length(text)`
    // denominator is Spark length = numChars (codepoints), so a
    // supplementary character must count once, not twice (r13 ADVICE fix)
    var alpha = 0
    var cpLen = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) alpha += 1
      cpLen += 1
      i += Character.charCount(cp)
    }
    val stopRatio = hits.toDouble / math.max(nTokens, 1).toDouble
    val alphaRatio = alpha.toDouble / math.max(cpLen, 1).toDouble
    val raw = 0.4 * math.min(nTokens / 200.0, 1.0) +
      0.3 * stopRatio + 0.3 * alphaRatio
    math.floor(raw * 10000.0 + 0.5) / 10000.0
  }
}

/** Native PII kernels. Spark's regexp_count / regexp_replace run the same
  * java.util.regex engine these kernels use, so match semantics are
  * IDENTICAL by construction — the win is structural: ONE UTF8String →
  * String decode instead of six, matchers reused via compiled static
  * patterns, and no intermediate UTF8String round-trips between the three
  * chained replaces. Counts are DETECTION counts over the RAW text and
  * redaction applies email → phone → IP in the documented order, exactly
  * like `TextOps.piiCounts` / `piiRedact` (the specs these replace on the
  * gate map path); the DuckDB oracles, which replicate the spec SQL,
  * transitively pin both kernels.
  */
object PiiKernels {
  import graft.text.TextOps.{EmailPattern, PhonePattern, Ipv4Pattern}
  private[functions] val Email = java.util.regex.Pattern.compile(EmailPattern)
  private[functions] val Phone = java.util.regex.Pattern.compile(PhonePattern)
  private[functions] val Ip = java.util.regex.Pattern.compile(Ipv4Pattern)

  private[functions] def count(p: java.util.regex.Pattern, s: String): Int = {
    val m = p.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }
}

/** struct(n_email, n_phone, n_ip) in one pass — the `cur_pii_stats` map. */
case class PiiCounts(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_email", IntegerType, nullable = false),
    StructField("n_phone", IntegerType, nullable = false),
    StructField("n_ip", IntegerType, nullable = false)))
  override def prettyName: String = "pii_counts_native"

  override protected def nullSafeEval(input: Any): Any =
    PiiCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("piiCountsHelper", PiiCounts,
      PiiCounts.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): PiiCounts =
    copy(child = newChild)
}

object PiiCounts {
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    new GenericInternalRow(Array[Any](
      PiiKernels.count(PiiKernels.Email, s),
      PiiKernels.count(PiiKernels.Phone, s),
      PiiKernels.count(PiiKernels.Ip, s)))
  }
}

/** struct(n_redacted, clean_len, clean_fp) in one pass — the
  * `cur_pii_redact` map: detection counts over raw text, then the ordered
  * three-stage redaction with length and base-31 fingerprint computed inline
  * on the final string (no re-decode, no second redaction evaluation).
  */
case class PiiRedactStats(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_redacted", IntegerType, nullable = false),
    StructField("clean_len", IntegerType, nullable = false),
    StructField("clean_fp", LongType, nullable = false)))
  override def prettyName: String = "pii_redact_stats_native"

  override protected def nullSafeEval(input: Any): Any =
    PiiRedactStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("piiRedactHelper", PiiRedactStats,
      PiiRedactStats.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): PiiRedactStats =
    copy(child = newChild)
}

object PiiRedactStats {
  import graft.text.TextOps.HashPrime

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = PiiKernels.count(PiiKernels.Email, s) +
      PiiKernels.count(PiiKernels.Phone, s) +
      PiiKernels.count(PiiKernels.Ip, s)
    val clean = PiiKernels.Ip.matcher(
      PiiKernels.Phone.matcher(
        PiiKernels.Email.matcher(s).replaceAll("<EMAIL>"))
        .replaceAll("<PHONE>"))
      .replaceAll("<IP>")
    new GenericInternalRow(Array[Any](n, clean.length,
      PolyHash.compute(clean, 31)))
  }
}


/** Native classifier-feature kernel: the five quality features
  * (length saturation, stopword ratio, alphabetic ratio, distinct-token
  * ratio, scaled mean word length) as one compiled pass returning
  * array<double> — the compiled form of
  * `QualityClassifier.featureColumnsSpec`. Bit-exactness contract: each
  * element reproduces the spec's IEEE value exactly (same divisions in
  * the same order, Spark split(-1) token semantics, int->double casts at
  * the same points), so the logit fold over these features is
  * bit-identical to the Column fold the DuckDB oracle mirrors —
  * differential-pinned in QualityClassifierSpec.
  */
case class QualityFeatures(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quality_features_native"

  // Seq for structural case-class equality (see QualityScore note)
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    QualityFeatures.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("qfHelper", QualityFeatures,
      QualityFeatures.getClass.getName)
    val set = ctx.addReferenceObj("qfStops", stopSet,
      classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t, $set);")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityFeatures =
    copy(child = newChild)
}

object QualityFeatures {
  def compute(text: UTF8String,
      stops: java.util.HashSet[String]): ArrayData = {
    val s = text.toString
    val words = TextKernelUtil.asciiTrimSplit(s)
    val n = words.length
    val nD = math.max(n, 1).toDouble
    val hits = TextKernelUtil.countIn(words, stops)
    val distinct = new java.util.HashSet[String](n * 2)
    var w = 0
    while (w < words.length) { distinct.add(words(w)); w += 1 }
    // iterate CODEPOINTS (r13 ADVICE fix): the spec's length() counts
    // codepoints, so a supplementary character is ONE unit of document
    // length and ONE non-whitespace character, not two
    var alpha = 0
    var nonWs = 0
    var cpLen = 0
    var i = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha += 1
      // java regex \s = [ \t\n\u000B\f\r] — what regexp_replace strips
      if (!(c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
            c == '\f' || c == '\r')) nonWs += 1
      cpLen += 1
      i += Character.charCount(c)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](
      math.min(n / 200.0, 1.0),
      hits / nD,
      alpha / math.max(cpLen, 1).toDouble,
      distinct.size / nD,
      nonWs / nD / 10.0))
  }
}
