package graft.bio

import scala.collection.mutable.ArrayBuffer

/** The five similarity kernels (SURVEY.md §2.3 X1–X5), their alignment
  * renders (X6), the weighted blend (X7) and the `fast_skip` prefilter (X8).
  *
  * All kernels compare a query `gene` against the genome window of length
  * `gene.length` starting at `offset` in `db`, under the one-directional
  * wobble rule [[Dna.baseMatches]]. Pure JVM functions: usable from Spark
  * UDFs, `mapPartitions` scans, and plain unit tests identically.
  *
  * Reference semantics (bit-compatible, including tie behavior):
  *   - X1 `src/analysis/similarities/direct_match_similarity.py:22-28`
  *   - X2 `src/analysis/similarities/text_edit_similarity.py:13-48`
  *   - X3 `src/analysis/similarities/consistency_similarity.py:35-64`
  *   - X5 `src/analysis/similarities/blat_similarity.py:58-116`
  *   - X6 `rendering_sequence` in each kernel file
  *   - X7 `src/analysis/gene_similarity_match.py:304-328`
  *   - X8 `src/analysis/gene_similarity_match.py:280-301`
  */
object SimilarityKernels {

  /** Alignment render: three parallel tracks (query, target, marks).
    * Marks: '*' match, '.' mismatch/gap, '-' bridged gap (consistency only).
    */
  final case class Render(gene: String, target: String, marks: String)

  // ---------------------------------------------------------------- X1 direct

  /** Positional (wobble) match count: Σ 1[g(i) ≈ db(o+i)]. */
  def directScore(gene: String, db: String, offset: Int): Double = {
    var score = 0
    var i = 0
    val n = gene.length
    while (i < n) {
      if (Dna.baseMatches(gene.charAt(i), db.charAt(offset + i))) score += 1
      i += 1
    }
    score.toDouble
  }

  def directRender(gene: String, db: String, offset: Int): Render = {
    val n = gene.length
    val marks = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      marks.append(if (Dna.baseMatches(gene.charAt(i), db.charAt(offset + i))) '*' else '.')
      i += 1
    }
    Render(gene, db.substring(offset, offset + n), marks.toString)
  }

  // ------------------------------------------------------------- X2 text_edit

  /** Wobble-aware edit distance DP between `gene` and the equal-length window.
    * Score = |gene| − dist. With `continuousMismatchLimit` set, the DP is
    * backtraced and the score zeroed if ≥limit consecutive non-match steps
    * occur (counting substitutions that are true mismatches and all
    * insert/delete steps; a match resets the run).
    *
    * NOT standard Levenshtein: the reference's INF-initialized borders
    * (`text_edit_similarity.py:16-18` — only dp[0][0]=0) force every
    * alignment path to enter at (1,1), i.e. the FIRST characters of gene
    * and window always align. Equivalently:
    * `anchored(g,w) = cost(g(0),w(0)) + levenshtein(g[1:], w[1:])`.
    * Verified by differential tests; preserved as parity semantics.
    *
    * The backtrace tie order (diagonal, then delete-from-gene, then
    * insert) matches the reference exactly — it changes which path is
    * reported, hence the render and the mismatch-limit outcome.
    */
  def textEditScore(
      gene: String,
      db: String,
      offset: Int,
      continuousMismatchLimit: Int = -1): Double = {
    val dp = textEditDp(gene, db, offset)
    val n = gene.length
    val score = (n - dp(n)(n)).toDouble
    if (continuousMismatchLimit > 0 &&
        hasLongMismatchRun(gene, db, offset, dp, continuousMismatchLimit)) 0.0
    else score
  }

  /** Full (|g|+1)² DP table; dp(i)(j) = min ops to turn g[0,i) into w[0,j). */
  private[bio] def textEditDp(gene: String, db: String, offset: Int): Array[Array[Int]] = {
    val n = gene.length
    val INF = 999999
    val dp = Array.fill(n + 1, n + 1)(INF)
    dp(0)(0) = 0
    var i = 1
    while (i <= n) {
      val ga = gene.charAt(i - 1)
      var j = 1
      while (j <= n) {
        val gb = db.charAt(offset + j - 1)
        var best = dp(i - 1)(j) + 1
        if (dp(i)(j - 1) + 1 < best) best = dp(i)(j - 1) + 1
        val diag = dp(i - 1)(j - 1) + Dna.changeCost(ga, gb)
        if (diag < best) best = diag
        dp(i)(j) = best
        j += 1
      }
      i += 1
    }
    dp
  }

  /** Backtrace the DP; true iff some ≥limit run of consecutive non-matches.
    * Reference `text_edit_similarity.py:26-47` (note it checks the run
    * length after every step and returns immediately — so a run ending at
    * the start of the alignment still triggers).
    */
  private def hasLongMismatchRun(
      gene: String, db: String, offset: Int,
      dp: Array[Array[Int]], limit: Int): Boolean = {
    var i = gene.length
    var j = gene.length
    var mismatch = 0
    while (i > 0 || j > 0) {
      if (i > 0 && j > 0 &&
          dp(i)(j) == dp(i - 1)(j - 1) + Dna.changeCost(gene.charAt(i - 1), db.charAt(offset + j - 1))) {
        if (Dna.changeCost(gene.charAt(i - 1), db.charAt(offset + j - 1)) != 0) mismatch += 1
        else mismatch = 0
        i -= 1; j -= 1
      } else if (dp(i)(j) == dp(i - 1)(j) + 1) {
        mismatch += 1; i -= 1
      } else if (dp(i)(j) == dp(i)(j - 1) + 1) {
        mismatch += 1; j -= 1
      } else {
        throw new IllegalStateException("unreachable DP backtrace state")
      }
      if (mismatch >= limit) return true
    }
    false
  }

  def textEditRender(gene: String, db: String, offset: Int): Render = {
    val dp = textEditDp(gene, db, offset)
    var i = gene.length
    var j = gene.length
    val g = new ArrayBuffer[Char](); val t = new ArrayBuffer[Char](); val m = new ArrayBuffer[Char]()
    while (i > 0 || j > 0) {
      val ga = if (i > 0) gene.charAt(i - 1) else '.'
      val gb = if (j > 0) db.charAt(offset + j - 1) else '.'
      if (i > 0 && j > 0 && dp(i)(j) == dp(i - 1)(j - 1) + Dna.changeCost(gene.charAt(i - 1), db.charAt(offset + j - 1))) {
        g += ga; t += gb
        m += (if (Dna.changeCost(gene.charAt(i - 1), db.charAt(offset + j - 1)) == 0) '*' else '.')
        i -= 1; j -= 1
      } else if (dp(i)(j) == dp(i - 1)(j) + 1) {
        g += ga; t += '.'; m += '.'; i -= 1
      } else if (dp(i)(j) == dp(i)(j - 1) + 1) {
        g += '.'; t += gb; m += '.'; j -= 1
      } else throw new IllegalStateException("unreachable DP backtrace state")
    }
    Render(g.reverse.mkString, t.reverse.mkString, m.reverse.mkString)
  }

  // ----------------------------------------------------------- X3 consistency

  /** Result of the consistency kernel: best bridged-run score, the run-length
    * queue [(runLen, endPos)], and the merged-run index interval — the queue
    * is reused by the render and by sub-hit extraction (SURVEY W4/G1).
    */
  final case class ConsistencyResult(
      score: Double,
      runs: Vector[(Int, Int)],
      mergeIdx: (Int, Int))

  /** Longest run of matches where up to `maxPatience` mismatch-gaps may be
    * bridged: collect maximal match runs, then for each start run try merging
    * up to `maxPatience` following runs while the merged span's unmatched
    * count stays ≤ maxPatience; keep the best total matched count.
    */
  def consistencyScore(gene: String, db: String, offset: Int, maxPatience: Int): ConsistencyResult = {
    val n = gene.length
    var score = 0
    var curScore = 0
    val queue = Vector.newBuilder[(Int, Int)]
    var i = 0
    while (i < n) {
      if (Dna.baseMatches(gene.charAt(i), db.charAt(offset + i))) {
        curScore += 1
        if (i == n - 1) queue += ((curScore, n))
      } else {
        queue += ((curScore, i))
        curScore = 0
      }
      if (curScore > score) score = curScore
      i += 1
    }
    val runs = queue.result()
    var mergeLo = -1
    var mergeHi = -1
    var idx = 0
    while (idx < runs.length) {
      val left = runs(idx)._2 - runs(idx)._1
      var totalScore = 0
      var width = 0
      var continue = true
      while (continue && width <= maxPatience) {
        if (width + idx < runs.length) {
          val totalLen = runs(idx + width)._2 - left
          totalScore += runs(idx + width)._1
          if (totalLen - totalScore > maxPatience) continue = false
          else if (score < totalScore) {
            score = totalScore
            mergeLo = idx; mergeHi = idx + width
          }
        }
        width += 1
      }
      idx += 1
    }
    ConsistencyResult(score.toDouble, runs, (mergeLo, mergeHi))
  }

  /** Marks: '*' inside runs, '-' in gaps bridged by the winning merge,
    * '.' elsewhere. Reference `consistency_similarity.py:7-30`.
    */
  def consistencyRender(gene: String, db: String, offset: Int, maxPatience: Int): Render = {
    val n = gene.length
    val res = consistencyScore(gene, db, offset, maxPatience)
    val (lo, hi) = res.mergeIdx
    val m = new java.lang.StringBuilder(n)
    var curPos = 0
    var idx = 0
    while (idx < res.runs.length) {
      val (cnt, end) = res.runs(idx)
      val start = end - cnt
      while (curPos < start) {
        m.append(if (lo < idx && idx <= hi) '-' else '.')
        curPos += 1
      }
      while (curPos < end) { m.append('*'); curPos += 1 }
      idx += 1
    }
    while (curPos < n) { m.append('.'); curPos += 1 }
    Render(gene, db.substring(offset, offset + n), m.toString)
  }

  // ------------------------------------------------------------------ X5 blat

  /** Seeded gapped alignment for 8-base queries: anchor g(0) at the offset,
    * DFS-match g(1..3) allowing ≤midLimit inserted subject bases, then g(4)
    * with ≤midLimit mid inserts (retrying deeper anchors on failure), then
    * g(5..7) with ≤endLimit inserts. Returns (matched?, subject end position
    * exclusive). Query length is fixed at 8 by the reference's constants —
    * enforced here; generalizing changes published truth tables.
    *
    * PARITY NOTE: the reference's current `BlatSimilarity` class
    * (`blat_similarity.py:58-116`) fails ALL its own truth-table cases
    * (`test_similarity_match.py:28-41` — verified by running it): when the
    * old `compute_blat_similarity` function was moved into the class, the
    * mid-phase entry became `pos_data+3, insert=3` and the phase-1 limit
    * became `end_limit`, breaking every positive case. We implement the
    * semantics the truth table pins down (SURVEY §5: "the expectations are
    * still gold"): phase-1 skips bounded by midLimit, mid phase entered at
    * `pos_data+1` with insert reset — all six cases reproduce exactly.
    */
  def blatSimilarity(
      gene: String, db: String, offset: Int,
      midLimit: Int = 10, endLimit: Int = 2): (Boolean, Option[Int]) = {
    require(gene.length == 8, s"blat kernel is defined for 8-base queries, got ${gene.length}")

    def searchDfs(posGene0: Int, posData0: Int, insertData0: Int): (Boolean, Option[Int]) = {
      var posGene = posGene0
      var posData = posData0
      var insertData = insertData0
      if (posGene < 4) {
        var matchedLen = 1
        var cond = false
        while (posGene < 4 && posData < db.length) {
          while (!Dna.baseMatches(gene.charAt(posGene), db.charAt(posData))) {
            matchedLen = 0
            insertData += 1
            posData += 1
            if (insertData > midLimit || posData >= db.length) return (false, None)
          }
          if (matchedLen > 0) cond = true
          matchedLen += 1
          posGene += 1
          posData += 1
        }
        if (!cond) (false, None)
        else searchDfs(4, posData + 1, 0)
      } else if (posGene == 4) {
        if (insertData > midLimit || posData >= db.length) return (false, None)
        while (!Dna.baseMatches(gene.charAt(posGene), db.charAt(posData))) {
          posData += 1
          insertData += 1
          if (posData >= db.length || insertData > midLimit) return (false, None)
        }
        val r = searchDfs(5, posData + 1, 0)
        if (r._1) r
        else searchDfs(4, posData + 1, insertData + 1)
      } else {
        var matchedLen = 1
        var cond = false
        while (posGene < 8 && posData < db.length) {
          while (!Dna.baseMatches(gene.charAt(posGene), db.charAt(posData))) {
            matchedLen = 0
            insertData += 1
            posData += 1
            if (insertData > endLimit || posData >= db.length) return (false, None)
          }
          if (matchedLen > 0) cond = true
          matchedLen += 1
          posGene += 1
          posData += 1
        }
        (cond, Some(posData))
      }
    }

    if (!Dna.baseMatches(gene.charAt(0), db.charAt(offset))) (false, None)
    else searchDfs(1, offset + 1, 0)
  }

  /** Blat render: greedy left walk over g(0..3), greedy right walk back over
    * g(7..4) from the DFS end position, '-' filler between.
    * Reference `blat_similarity.py:12-56`.
    */
  def blatRender(gene: String, db: String, offset: Int): Render = {
    val (_, posEndOpt) = blatSimilarity(gene, db, offset)
    val posDataEnd = posEndOpt.getOrElse(offset + gene.length)
    val g = new ArrayBuffer[Char](); val t = new ArrayBuffer[Char](); val m = new ArrayBuffer[Char]()
    var posData = offset
    var posGene = 0
    while (posGene < 4) {
      if (!Dna.baseMatches(gene.charAt(posGene), db.charAt(posData))) {
        g += '-'; t += db.charAt(posData); m += '.'; posData += 1
      } else {
        g += gene.charAt(posGene); t += db.charAt(posData); m += '*'
        posGene += 1; posData += 1
      }
    }
    var revPosGene = 7
    var revPosData = posDataEnd - 1
    val rg = new ArrayBuffer[Char](); val rt = new ArrayBuffer[Char](); val rm = new ArrayBuffer[Char]()
    while (revPosGene > 3) {
      if (!Dna.baseMatches(gene.charAt(revPosGene), db.charAt(revPosData))) {
        rg += '-'; rt += db.charAt(revPosData); rm += '.'; revPosData -= 1
      } else {
        rg += gene.charAt(revPosGene); rt += db.charAt(revPosData); rm += '*'
        revPosGene -= 1; revPosData -= 1
      }
    }
    while (posData <= revPosData) {
      g += '-'; t += db.charAt(posData); m += '.'; posData += 1
    }
    g ++= rg.reverse; t ++= rt.reverse; m ++= rm.reverse
    Render(g.mkString, t.mkString, m.mkString)
  }

  // ------------------------------------------------------------ X7 blend

  /** Kernel parameters for a blended scan (defaults = reference factory
    * defaults, `similarity_factory.py:12-21`).
    */
  final case class KernelConfig(
      maxPatience: Int = 2,
      continuousMismatchLimit: Int = -1,
      pattern: Option[MatchPattern] = None,
      midLimit: Int = 10,
      endLimit: Int = 2)

  /** Weighted blend over enabled kernels: Σ wᵢ·scoreᵢ / Σ wᵢ, plus the
    * per-kernel score map. Kernel names: direct, text_edit, consistency,
    * pattern, blat (blat's Boolean blends as 0/1; pattern uses the fixed
    * tuple signature — the reference's bare-int bug in
    * `pattern_similarity.py:13-24` is fixed, not copied, per SURVEY §2.3 X4).
    */
  /** Byte-path twin of [[blendedScore]] for the kernels with byte forms
    * (direct / consistency / text_edit without a mismatch limit — exactly
    * [[GenomeScan.byteEligible]]'s set). Lets the scan's reduce stage
    * score final survivors straight off the broadcast byte arrays instead
    * of rebuilding multi-MB String copies per group task. Kernel-for-
    * kernel equality with the String forms is spec-pinned.
    */
  def blendedScoreB(
      weights: Map[String, Double],
      gene: Array[Byte], db: Array[Byte], offset: Int, maxPatience: Int,
      runLen: Array[Int], runEnd: Array[Int], dpBuf: Array[Int]): (Double, Map[String, Double]) = {
    var weighted = 0.0
    var totalWeight = 0.0
    val scores = Map.newBuilder[String, Double]
    weights.foreach { case (kernel, w) =>
      if (w > 0) {
        val score = kernel match {
          case "direct"      => directScoreB(gene, db, offset)
          case "text_edit"   => textEditScoreOnlyB(gene, db, offset, dpBuf)
          case "consistency" => consistencyScoreOnlyB(gene, db, offset, maxPatience, runLen, runEnd)
          case other => throw new IllegalArgumentException(s"kernel has no byte path: $other")
        }
        scores += kernel -> score
        weighted += score * w
        totalWeight += w
      }
    }
    require(totalWeight > 0, "at least one kernel must have positive weight")
    (weighted / totalWeight, scores.result())
  }

  def blendedScore(
      weights: Map[String, Double],
      gene: String, db: String, offset: Int,
      cfg: KernelConfig = KernelConfig()): (Double, Map[String, Double]) = {
    var weighted = 0.0
    var totalWeight = 0.0
    val scores = Map.newBuilder[String, Double]
    weights.foreach { case (kernel, w) =>
      if (w > 0) {
        val score = kernel match {
          case "direct"      => directScore(gene, db, offset)
          case "text_edit"   => textEditScore(gene, db, offset, cfg.continuousMismatchLimit)
          case "consistency" => consistencyScore(gene, db, offset, cfg.maxPatience).score
          case "pattern"     => cfg.pattern.map(_.score(db.substring(offset, math.min(offset + gene.length, db.length)))).getOrElse(0).toDouble
          case "blat"        => if (blatSimilarity(gene, db, offset, cfg.midLimit, cfg.endLimit)._1) 1.0 else 0.0
          case other         => throw new IllegalArgumentException(s"unknown kernel: $other")
        }
        scores += kernel -> score
        weighted += score * w
        totalWeight += w
      }
    }
    require(totalWeight > 0, "at least one kernel must have positive weight")
    (weighted / totalWeight, scores.result())
  }

  // ---------------------------------------------- allocation-free hot paths

  /** Score-only consistency kernel with caller-provided scratch arrays
    * (size ≥ gene.length+1): identical result to [[consistencyScore]]
    * (asserted by tests) without building the run vectors — the genome
    * scan calls this ~10⁷ times per gene, where per-offset allocation is
    * the dominant cost.
    */
  def consistencyScoreOnly(
      gene: String, db: String, offset: Int, maxPatience: Int,
      runLen: Array[Int], runEnd: Array[Int]): Double = {
    val n = gene.length
    var score = 0
    var curScore = 0
    var nRuns = 0
    var i = 0
    while (i < n) {
      if (Dna.baseMatches(gene.charAt(i), db.charAt(offset + i))) {
        curScore += 1
        if (i == n - 1) { runLen(nRuns) = curScore; runEnd(nRuns) = n; nRuns += 1 }
      } else {
        runLen(nRuns) = curScore; runEnd(nRuns) = i; nRuns += 1
        curScore = 0
      }
      if (curScore > score) score = curScore
      i += 1
    }
    var idx = 0
    while (idx < nRuns) {
      val left = runEnd(idx) - runLen(idx)
      var totalScore = 0
      var width = 0
      var continue = true
      while (continue && width <= maxPatience) {
        if (width + idx < nRuns) {
          val totalLen = runEnd(idx + width) - left
          totalScore += runLen(idx + width)
          if (totalLen - totalScore > maxPatience) continue = false
          else if (score < totalScore) score = totalScore
        }
        width += 1
      }
      idx += 1
    }
    score.toDouble
  }

  /** Score-only edit-distance kernel over a caller-provided flattened DP
    * buffer (size ≥ (n+1)²) — same values as [[textEditScore]] without the
    * limit backtrace (the scan path never sets the limit; configs that do
    * use the allocating variant).
    */
  def textEditScoreOnly(gene: String, db: String, offset: Int, dp: Array[Int]): Double = {
    val n = gene.length
    val w = n + 1
    val INF = 999999
    java.util.Arrays.fill(dp, 0, w * w, INF)
    dp(0) = 0
    var i = 1
    while (i <= n) {
      val ga = gene.charAt(i - 1)
      val row = i * w
      val prev = row - w
      var j = 1
      while (j <= n) {
        val gb = db.charAt(offset + j - 1)
        var best = dp(prev + j) + 1
        val left = dp(row + j - 1) + 1
        if (left < best) best = left
        val diag = dp(prev + j - 1) + Dna.changeCost(ga, gb)
        if (diag < best) best = diag
        dp(row + j) = best
        j += 1
      }
      i += 1
    }
    (n - dp(n * w + n)).toDouble
  }

  // ------------------------------------------- byte-array scan hot paths

  /** Byte-array twins of the score-only kernels for the scan's inner
    * loop. `String.charAt` pays a compact-string coder check per
    * character (Java 17+), which at ~30 chars/window dominates the
    * measured per-window cost; indexing byte arrays converted ONCE per
    * broadcast removes it. Wobble rule and arithmetic are identical to
    * the Char variants for the ASCII DNA alphabet — equivalence is
    * asserted offset-by-offset in GenomeScanSpec.
    */
  @inline private def baseMatchesB(a: Byte, b: Byte): Boolean =
    a == b || (a == 'c' && b == 't')

  def directScoreB(gene: Array[Byte], db: Array[Byte], offset: Int): Double = {
    var score = 0
    var i = 0
    val n = gene.length
    while (i < n) {
      if (baseMatchesB(gene(i), db(offset + i))) score += 1
      i += 1
    }
    score.toDouble
  }

  /** Branchless consistency kernel for genes ≤ 64 bases (the production
    * scan hot path — reference genes run 20–60). Uses the interval-max
    * identity proven by the X3 property test (best bridged-run score ==
    * max matches over any window with ≤ maxPatience mismatches):
    *
    *   1. build a 64-bit MATCH MASK — bit i = gene(i) ≈ db(offset+i) —
    *      with pure arithmetic (`((x ^ y) − 1) >>> 31` equality bit), no
    *      data-dependent branch: the run-based port stalls ~50 cycles
    *      per char on random genomes from match/mismatch mispredictions;
    *   2. two-pointer sweep over the mask: extend right, advance left
    *      while the window holds > maxPatience mismatches, track max
    *      matches — O(n), each step a handful of shifts/adds.
    *
    * Genes > 64 bases fall back to the run-based form
    * ([[consistencyScoreOnlyRunsB]]); offset-for-offset equality of the
    * two (and of byte vs String paths) is asserted in GenomeScanSpec.
    */
  def consistencyScoreOnlyB(
      gene: Array[Byte], db: Array[Byte], offset: Int, maxPatience: Int,
      runLen: Array[Int], runEnd: Array[Int]): Double = {
    val n = gene.length
    if (n > 64) return consistencyScoreOnlyRunsB(gene, db, offset, maxPatience, runLen, runEnd)
    var mask = 0L
    var i = 0
    while (i < n) {
      // mask to [0,255] BEFORE the arithmetic trick: with sign-extended
      // bytes, g^d can be negative (exactly one of the two >= 0x80) and
      // ((g^d)-1) >>> 31 would report a false match for non-ASCII input
      val g: Int = gene(i) & 0xFF
      val d: Int = db(offset + i) & 0xFF
      val eq = ((g ^ d) - 1) >>> 31               // 1 iff g == d (any byte)
      val wob = (((g ^ 99) - 1) >>> 31) & (((d ^ 116) - 1) >>> 31) // g=='c' && d=='t'
      mask |= (eq | wob).toLong << i
      i += 1
    }
    // mismatch POSITIONS m_0 < … < m_{k-1} via bit iteration (k ≈ n/2 on
    // random data; the borrowed runLen scratch holds them). The best
    // window with ≤ p mismatches is bounded by two mismatches p+1 apart:
    // span (m_{t-1}, m_{t+p}) exclusive holds exactly p mismatches, so
    // matches = gap − 1 − p; max over t with sentinels m_{-1} = −1,
    // m_k = n. Each loop step is a subtract + max — no data-dependent
    // branch, unlike a per-bit two-pointer sweep.
    val full = if (n == 64) -1L else (1L << n) - 1
    var mm = ~mask & full
    var k = 0
    while (mm != 0L) {
      runLen(k) = java.lang.Long.numberOfTrailingZeros(mm)
      k += 1
      mm &= mm - 1
    }
    if (k <= maxPatience) return (n - k).toDouble
    var best = 0
    var t = 0
    while (t <= k - maxPatience) {
      val lo = if (t == 0) -1 else runLen(t - 1)
      val hi = if (t + maxPatience < k) runLen(t + maxPatience) else n
      val m = hi - lo - 1 - maxPatience
      if (m > best) best = m
      t += 1
    }
    best.toDouble
  }

  /** The run-collection port of the consistency kernel over bytes — the
    * > 64-base fallback of [[consistencyScoreOnlyB]] and the structural
    * twin of the String-path [[consistencyScoreOnly]].
    */
  def consistencyScoreOnlyRunsB(
      gene: Array[Byte], db: Array[Byte], offset: Int, maxPatience: Int,
      runLen: Array[Int], runEnd: Array[Int]): Double = {
    val n = gene.length
    var score = 0
    var curScore = 0
    var nRuns = 0
    var i = 0
    while (i < n) {
      if (baseMatchesB(gene(i), db(offset + i))) {
        curScore += 1
        if (i == n - 1) { runLen(nRuns) = curScore; runEnd(nRuns) = n; nRuns += 1 }
      } else {
        runLen(nRuns) = curScore; runEnd(nRuns) = i; nRuns += 1
        curScore = 0
      }
      if (curScore > score) score = curScore
      i += 1
    }
    var idx = 0
    while (idx < nRuns) {
      val left = runEnd(idx) - runLen(idx)
      var totalScore = 0
      var width = 0
      var continue = true
      while (continue && width <= maxPatience) {
        if (width + idx < nRuns) {
          val totalLen = runEnd(idx + width) - left
          totalScore += runLen(idx + width)
          if (totalLen - totalScore > maxPatience) continue = false
          else if (score < totalScore) score = totalScore
        }
        width += 1
      }
      idx += 1
    }
    score.toDouble
  }

  def textEditScoreOnlyB(
      gene: Array[Byte], db: Array[Byte], offset: Int, dp: Array[Int]): Double = {
    val n = gene.length
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
        val gb = db(offset + j - 1)
        var best = dp(prev + j) + 1
        val left = dp(row + j - 1) + 1
        if (left < best) best = left
        val diag = dp(prev + j - 1) + (if (baseMatchesB(ga, gb)) 0 else 1)
        if (diag < best) best = diag
        dp(row + j) = best
        j += 1
      }
      i += 1
    }
    (n - dp(n * w + n)).toDouble
  }

  // -------------------------------------------------------- X8 fast_skip

  /** Per-base counts of a sequence (reference `count_acgt`). */
  def countBases(gene: String): Map[Char, Int] =
    gene.groupMapReduce(identity)(_ => 1)(_ + _)

  // ---------------------------------------- W1 column-wise scan variants

  /** Best direct-similarity window of `gene` over EVERY offset of `text`:
    * (1-based offset, score), ties resolving to the LOWEST offset — the
    * column-wise twin of the [[GenomeScan]] sliding window (same kernel,
    * same left-to-right sweep, applied per row of a string column instead
    * of per chunk of one genome). One compiled pass per row; at 100 TB
    * this is scan-stage compute with no shuffle until the caller
    * aggregates.
    */
  def bestDirectWindow(gene: String, text: String): (Int, Double) = {
    val n = gene.length
    var bestOff = 0
    var best = -1
    var o = 0
    val last = text.length - n
    while (o <= last) {
      var s = 0
      var i = 0
      while (i < n) {
        if (Dna.baseMatches(gene.charAt(i), text.charAt(o + i))) s += 1
        i += 1
      }
      if (s > best) { best = s; bestOff = o }
      o += 1
    }
    (bestOff + 1, best.toDouble)
  }

  /** Blat sweep over the leading offsets of `dna`: number of offsets where
    * the X5 DFS matches, and the DFS end position of the first hit (−1 if
    * none). Offsets stop `gene.length + midLimit + endLimit + 2` short of
    * the end so every DFS path stays in bounds.
    */
  def blatSweep(gene: String, dna: String,
      midLimit: Int = 10, endLimit: Int = 2): (Long, Int) = {
    var hits = 0L
    var firstEnd = -1
    var o = 0
    val last = dna.length - gene.length - midLimit - endLimit - 2
    while (o <= last) {
      val (ok, endOpt) = blatSimilarity(gene, dna, o, midLimit, endLimit)
      if (ok) {
        hits += 1
        if (firstEnd < 0) firstEnd = endOpt.getOrElse(-1)
      }
      o += 1
    }
    (hits, firstEnd)
  }

  /** Histogram prune: true (skip this offset) when the window shares fewer
    * than `cutSame` characters with the query histogram, or fails the
    * optional anchored regex gate. Vestigial in the reference scan loop but
    * unit-tested there — kept as an optional cheap prefilter before X2/X3.
    */
  def fastSkip(
      geneCounts: Map[Char, Int],
      geneLength: Int,
      db: String,
      offset: Int,
      cutSame: Int,
      pattern: Option[java.util.regex.Pattern]): Boolean = {
    val window = db.substring(offset, math.min(offset + geneLength, db.length))
    pattern match {
      case Some(p) if !p.matcher(window).lookingAt() => return true
      case _ => ()
    }
    val windowCounts = countBases(window)
    var same = 0
    val it = geneCounts.iterator
    while (it.hasNext) {
      val (c, cnt) = it.next()
      windowCounts.get(c).foreach { wc =>
        same += math.min(cnt, wc)
        if (same >= cutSame) return false
      }
    }
    true
  }
}
