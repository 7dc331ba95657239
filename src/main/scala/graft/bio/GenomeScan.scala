package graft.bio

import org.apache.spark.sql.{Dataset, SparkSession}

/** One scored hit of a query gene against the genome (output of [[GenomeScan]]). */
final case class ScanHit(
    name: String,
    isReverse: Boolean,
    left: Int,
    right: Int,
    start: Int,
    end: Int,
    weightedSimilarity: Double,
    scores: Map[String, Double])

/** Scan configuration — field-for-field the reference's ctor knobs
  * (`src/analysis/gene_similarity_match.py:26-46`,
  * flagship values `src/1-run_gene_similarity_match.py:14-44`).
  */
final case class ScanConfig(
    weights: Map[String, Double],
    topK: Int = 20,
    candidateDistance: Int = 5,
    patience: Int = 0,
    continuousMismatchLimit: Int = -1,
    ascending: Boolean = false,
    numChunks: Int = 32,
    mustConditions: Seq[PatternCondition] = Nil,
    optionalConditions: Seq[PatternCondition] = Nil) {
  def hasPattern: Boolean = mustConditions.nonEmpty || optionalConditions.nonEmpty
}

/** W1 — the sliding-window genome scan (SURVEY §2.7 W1, §3.1 stage 4): for
  * each query gene × strand × offset, blend the enabled similarity kernels,
  * suppress spatially-crowded candidates (T1), and keep the global top-k
  * per gene.
  *
  * Distribution model (vs the reference's 2-process × 32-chunk × 2-strand
  * ThreadPool, `gene_similarity_match.py:78,98-104`):
  *
  *   - the genome (and its reverse complement) is a **broadcast variable**
  *     — reference data, not a fact table (4.6 MB for E. coli; at 100 TB
  *     of *queries* the scan parallelism is genes × chunks, which this
  *     already partitions on);
  *   - work unit = (gene, strand, chunk): embarrassingly parallel tasks,
  *     `genes × 2 × numChunks` of them, spread over executors via a plain
  *     `repartition` — no shuffle of genome data ever happens;
  *   - each task runs the scan loop locally: kernel blend per offset →
  *     T1 deque suppression (deque state is per-chunk exactly like each
  *     reference thread task) → bounded per-chunk top-k;
  *   - per-gene global top-k = `groupByKey(gene).flatMapGroups` over the
  *     ≤ `2·numChunks·topK` chunk survivors — a tiny shuffle.
  *
  * Scaling knob: `numChunks`. At 1000 executors scanning many genomes,
  * raise it so `genes × 2 × numChunks ≳ 3 × totalCores`; per-task state
  * stays O(topK + candidateDistance) regardless.
  */
object GenomeScan {

  /** Chunk boundaries — reference `next_interval`
    * (`gene_similarity_match.py:89-95`): `numChunks` half-open intervals of
    * size `size / numChunks` (integer division; a final short tail interval
    * absorbs the remainder, and a zero batch size degenerates to one chunk).
    */
  def chunks(size: Int, numChunks: Int): Seq[(Int, Int)] = {
    val batch = math.max(size / numChunks, 1)
    Iterator.iterate(0)(_ + batch).takeWhile(_ < size)
      .map(s => (s, math.min(s + batch, size))).toSeq
  }

  /** Scan one chunk of one strand for one gene — the reference's
    * `match_gene` loop (`gene_similarity_match.py:157-235`) as a pure
    * function. Returns the chunk's suppressed, locally-top-k candidates.
    *
    * Hot path: scores evaluate through the allocation-free kernel variants
    * with per-chunk scratch buffers, and the suppression deque runs over
    * primitive arrays — candidate objects (with their per-kernel score
    * maps) materialize only for the ≤ topK survivors, whose kernels are
    * re-evaluated once. Equivalence with the object-based
    * [[Suppression.suppress]] is asserted by GenomeScanSpec, and the whole
    * path is pinned by ScanDifferentialSpec against the executed reference.
    */
  def scanChunk(
      gene: String,
      db: String,
      isReverse: Boolean,
      chunkStart: Int,
      chunkEnd: Int,
      cfg: ScanConfig): Vector[MatchCandidate] = {
    val geneLength = gene.length
    val kcfg = SimilarityKernels.KernelConfig(
      maxPatience = cfg.patience,
      continuousMismatchLimit = cfg.continuousMismatchLimit,
      pattern =
        if (cfg.hasPattern) Some(MatchPattern(gene, cfg.mustConditions, cfg.optionalConditions))
        else None)
    scanChunkSlim(gene, db, isReverse, chunkStart, chunkEnd, cfg).map { case (signed, left) =>
      val (_, scores) = SimilarityKernels.blendedScore(cfg.weights, gene, db, left, kcfg)
      MatchCandidate(left, left + geneLength - 1, isReverse, db.length, signed, scores)
    }
  }

  /** The chunk scan WITHOUT per-survivor kernel re-evaluation: returns the
    * suppressed local top-k as slim (signedScore, left) pairs. The scan
    * driver uses this form so the survivor shuffle carries two primitives
    * per row instead of a `Map[String, Double]` per candidate (up to
    * chunks×topK of them — the dominant shuffle payload at flagship
    * topK=1000); the score maps materialize once, for the ≤topK FINAL
    * survivors per gene, in the reduce stage.
    */
  def scanChunkSlim(
      gene: String,
      db: String,
      isReverse: Boolean,
      chunkStart: Int,
      chunkEnd: Int,
      cfg: ScanConfig): Vector[(Double, Int)] = {
    val geneLength = gene.length
    val dbLength = db.length
    val end = math.min(dbLength - geneLength + 1, chunkEnd)
    val pattern =
      if (cfg.hasPattern) Some(MatchPattern(gene, cfg.mustConditions, cfg.optionalConditions))
      else None
    val kcfg = SimilarityKernels.KernelConfig(
      maxPatience = cfg.patience,
      continuousMismatchLimit = cfg.continuousMismatchLimit,
      pattern = pattern)

    // per-chunk scratch buffers for the score-only kernel paths
    val runLen = new Array[Int](geneLength + 1)
    val runEnd = new Array[Int](geneLength + 1)
    val dpBuf =
      if (cfg.weights.getOrElse("text_edit", 0.0) > 0 && cfg.continuousMismatchLimit <= 0)
        new Array[Int]((geneLength + 1) * (geneLength + 1))
      else null
    val kernels = cfg.weights.toArray.filter(_._2 > 0)
    var totalWeight = 0.0
    kernels.foreach(totalWeight += _._2)
    require(totalWeight > 0, "at least one kernel must have positive weight")

    def blendedAt(offset: Int): Double = {
      var weighted = 0.0
      var i = 0
      while (i < kernels.length) {
        val (k, w) = kernels(i)
        val s = k match {
          case "direct" => SimilarityKernels.directScore(gene, db, offset)
          case "consistency" =>
            SimilarityKernels.consistencyScoreOnly(gene, db, offset, cfg.patience, runLen, runEnd)
          case "text_edit" =>
            if (dpBuf != null) SimilarityKernels.textEditScoreOnly(gene, db, offset, dpBuf)
            else SimilarityKernels.textEditScore(gene, db, offset, cfg.continuousMismatchLimit)
          case "pattern" =>
            pattern.map(_.score(db.substring(offset, math.min(offset + geneLength, dbLength))))
              .getOrElse(0).toDouble
          case "blat" =>
            if (SimilarityKernels.blatSimilarity(gene, db, offset,
                kcfg.midLimit, kcfg.endLimit)._1) 1.0 else 0.0
          case other => throw new IllegalArgumentException(s"unknown kernel: $other")
        }
        weighted += s * w
        i += 1
      }
      weighted / totalWeight
    }

    // primitive-array ring deque (capacity candidateDistance+1): the
    // reference's update_candidate_list over (left, score, ignored)
    val cap = cfg.candidateDistance + 2
    val dqLeft = new Array[Int](cap)
    val dqScore = new Array[Double](cap)
    val dqIgnored = new Array[Boolean](cap)
    var dqHead = 0
    var dqSize = 0
    val dropNonPositive = !cfg.ascending

    // survivors feed a bounded top-k heap ranked (-score, left); the java
    // heap holds WORST-first so poll() evicts the current worst. Once the
    // heap is full, candidates at-or-below the current worst are dropped
    // BEFORE boxing/adding — at flagship topK=1000 the suppression stage
    // still emits ~offsets/candidateDistance survivors per chunk, and
    // without the guard every one of them pays an alloc + two O(log k)
    // heap ops only to be evicted immediately.
    val heap = new java.util.PriorityQueue[(Double, Int)](math.max(cfg.topK, 1),
      new java.util.Comparator[(Double, Int)] {
        def compare(a: (Double, Int), b: (Double, Int)): Int = {
          val c = java.lang.Double.compare(a._1, b._1) // lower score = worse
          if (c != 0) c else java.lang.Integer.compare(b._2, a._2) // larger left = worse
        }
      })

    def emit(left: Int, score: Double): Unit = {
      if (heap.size >= cfg.topK) {
        val worst = heap.peek()
        // worse-or-equal than the current worst ⇒ it would be polled
        // straight back out (rank ties are impossible: left is unique)
        if (score < worst._1 || (score == worst._1 && left > worst._2)) return
        heap.add((score, left))
        heap.poll()
      } else heap.add((score, left))
    }

    def update(newLeft: Int, newScore: Double, hasNew: Boolean, keepSize: Int): Unit = {
      while (dqSize >= keepSize ||
             (dqSize > 0 && hasNew && math.abs(dqLeft(dqHead) - newLeft) >= keepSize)) {
        if (!dqIgnored(dqHead)) emit(dqLeft(dqHead), dqScore(dqHead))
        dqHead = (dqHead + 1) % cap
        dqSize -= 1
      }
      if (hasNew) {
        var ignored = dropNonPositive && newScore <= 0.0
        var i = 0
        while (i < dqSize) {
          val pos = (dqHead + i) % cap
          if (dqScore(pos) > newScore) ignored = true
          else if (dqScore(pos) < newScore) dqIgnored(pos) = true
          i += 1
        }
        val tail = (dqHead + dqSize) % cap
        dqLeft(tail) = newLeft
        dqScore(tail) = newScore
        dqIgnored(tail) = ignored
        dqSize += 1
      }
    }

    var offset = chunkStart
    while (offset < end) {
      val blended = blendedAt(offset)
      val signed = if (cfg.ascending) -blended else blended
      update(offset, signed, hasNew = true, cfg.candidateDistance)
      offset += 1
    }
    while (dqSize > 0) update(0, 0.0, hasNew = false, 1)

    val survivors = new Array[(Double, Int)](heap.size)
    var i = survivors.length - 1
    while (i >= 0) { survivors(i) = heap.poll(); i -= 1 } // drains worst-first
    survivors.sortBy { case (score, left) => (-score, left) }.toVector
  }

  /** Kernel sets the byte fast path supports: pattern/blat need String
    * machinery (regex, substring windows), and a positive
    * continuousMismatchLimit needs the backtrace variant.
    */
  private[bio] def byteEligible(cfg: ScanConfig): Boolean =
    !cfg.hasPattern && cfg.continuousMismatchLimit <= 0 &&
      cfg.weights.filter(_._2 > 0).keySet.subsetOf(Set("direct", "consistency", "text_edit"))

  /** Byte-array twin of [[scanChunkSlim]] for configs within
    * [[byteEligible]] — the production hot path ([[scan]] dispatches
    * here): byte-indexed kernels (no charAt coder checks), integer kernel
    * tags instead of per-offset string matching, and a wrap-if deque
    * instead of modulo arithmetic. Offset-for-offset equivalence with the
    * String path is asserted in GenomeScanSpec.
    */
  def scanChunkSlimBytes(
      gene: Array[Byte],
      db: Array[Byte],
      isReverse: Boolean,
      chunkStart: Int,
      chunkEnd: Int,
      cfg: ScanConfig): Vector[(Double, Int)] = {
    val geneLength = gene.length
    val dbLength = db.length
    val end = math.min(dbLength - geneLength + 1, chunkEnd)

    val runLen = new Array[Int](geneLength + 1)
    val runEnd = new Array[Int](geneLength + 1)
    val kernels = cfg.weights.toArray.filter(_._2 > 0)
    val dpBuf =
      if (kernels.exists(_._1 == "text_edit")) new Array[Int]((geneLength + 1) * (geneLength + 1))
      else null
    // integer tags: 0 direct, 1 consistency, 2 text_edit
    val tags = kernels.map {
      case ("direct", _) => 0
      case ("consistency", _) => 1
      case ("text_edit", _) => 2
      case (other, _) => throw new IllegalArgumentException(s"byte path: $other")
    }
    val wts = kernels.map(_._2)
    var totalWeight = 0.0
    wts.foreach(totalWeight += _)
    require(totalWeight > 0, "at least one kernel must have positive weight")
    val patience = cfg.patience

    val cap = cfg.candidateDistance + 2
    val dqLeft = new Array[Int](cap)
    val dqScore = new Array[Double](cap)
    val dqIgnored = new Array[Boolean](cap)
    var dqHead = 0
    var dqSize = 0
    val dropNonPositive = !cfg.ascending

    val heap = new java.util.PriorityQueue[(Double, Int)](math.max(cfg.topK, 1),
      new java.util.Comparator[(Double, Int)] {
        def compare(a: (Double, Int), b: (Double, Int)): Int = {
          val c = java.lang.Double.compare(a._1, b._1)
          if (c != 0) c else java.lang.Integer.compare(b._2, a._2)
        }
      })

    // same full-heap guard as the String path (see scanChunkSlim.emit)
    def emit(left: Int, score: Double): Unit = {
      if (heap.size >= cfg.topK) {
        val worst = heap.peek()
        if (score < worst._1 || (score == worst._1 && left > worst._2)) return
        heap.add((score, left))
        heap.poll()
      } else heap.add((score, left))
    }

    def update(newLeft: Int, newScore: Double, hasNew: Boolean, keepSize: Int): Unit = {
      while (dqSize >= keepSize ||
             (dqSize > 0 && hasNew && math.abs(dqLeft(dqHead) - newLeft) >= keepSize)) {
        if (!dqIgnored(dqHead)) emit(dqLeft(dqHead), dqScore(dqHead))
        dqHead += 1; if (dqHead == cap) dqHead = 0
        dqSize -= 1
      }
      if (hasNew) {
        var ignored = dropNonPositive && newScore <= 0.0
        var i = 0
        var pos = dqHead
        while (i < dqSize) {
          if (dqScore(pos) > newScore) ignored = true
          else if (dqScore(pos) < newScore) dqIgnored(pos) = true
          pos += 1; if (pos == cap) pos = 0
          i += 1
        }
        dqLeft(pos) = newLeft
        dqScore(pos) = newScore
        dqIgnored(pos) = ignored
        dqSize += 1
      }
    }

    var offset = chunkStart
    while (offset < end) {
      var weighted = 0.0
      var i = 0
      while (i < tags.length) {
        val s = tags(i) match {
          case 0 => SimilarityKernels.directScoreB(gene, db, offset)
          case 1 => SimilarityKernels.consistencyScoreOnlyB(gene, db, offset, patience, runLen, runEnd)
          case _ => SimilarityKernels.textEditScoreOnlyB(gene, db, offset, dpBuf)
        }
        weighted += s * wts(i)
        i += 1
      }
      val blended = weighted / totalWeight
      val signed = if (cfg.ascending) -blended else blended
      update(offset, signed, hasNew = true, cfg.candidateDistance)
      offset += 1
    }
    while (dqSize > 0) update(0, 0.0, hasNew = false, 1)

    val survivors = new Array[(Double, Int)](heap.size)
    var i = survivors.length - 1
    while (i >= 0) { survivors(i) = heap.poll(); i -= 1 }
    survivors.sortBy { case (score, left) => (-score, left) }.toVector
  }

  /** Multi-genome scan — the many-accessions scale shape (one row per
    * genome, e.g. every downloaded accession of the neighbor pipeline):
    * genomes stay DISTRIBUTED as Dataset rows, genes broadcast (the small
    * side), each (genome × gene × strand) scans locally and keeps its
    * per-genome-per-gene top-k. No genome string ever shuffles; the only
    * movement is the tiny survivor set. For genomes too large for one row,
    * pre-chunk with `candidateDistance + |gene|` overlap margins and feed
    * the chunks as rows — suppression state is per-chunk exactly like the
    * reference's thread split, so chunk boundaries are already semantic
    * boundaries.
    */
  def scanGenomes(
      genomes: org.apache.spark.sql.Dataset[(String, String)],
      genes: Seq[(String, String)],
      cfg: ScanConfig): Dataset[(String, ScanHit)] = {
    val spark = genomes.sparkSession
    import spark.implicits._
    val genesB = spark.sparkContext.broadcast(genes)
    val cfgB = spark.sparkContext.broadcast(cfg)
    genomes.flatMap { case (genomeId, genome) =>
      val cfg = cfgB.value
      val rev = Dna.reverseComplement(genome)
      val useBytes = byteEligible(cfg)
      val iso = java.nio.charset.StandardCharsets.ISO_8859_1
      val (fwdBytes, revBytes) =
        if (useBytes) (genome.getBytes(iso), rev.getBytes(iso))
        else (Array.emptyByteArray, Array.emptyByteArray)
      genesB.value.flatMap { case (name, gene) =>
        val kcfg = SimilarityKernels.KernelConfig(
          maxPatience = cfg.patience,
          continuousMismatchLimit = cfg.continuousMismatchLimit,
          pattern =
            if (cfg.hasPattern) Some(MatchPattern(gene, cfg.mustConditions, cfg.optionalConditions))
            else None)
        // same slim shape as [[scan]]: survivors are (signed, left) until
        // the final per-gene top-k, whose kernels evaluate once
        val geneBytes = if (useBytes) gene.getBytes(iso) else Array.emptyByteArray
        val slim: Seq[(Boolean, Int, Double)] =
          Seq(false, true).flatMap { isReverse =>
            chunks(genome.length, cfg.numChunks).flatMap { case (s, e) =>
              val survivors =
                if (useBytes)
                  scanChunkSlimBytes(geneBytes,
                    if (isReverse) revBytes else fwdBytes, isReverse, s, e, cfg)
                else
                  scanChunkSlim(gene, if (isReverse) rev else genome, isReverse, s, e, cfg)
              survivors.map { case (signed, left) => (isReverse, left, signed) }
            }
          }
        val rank: ((Boolean, Int, Double)) => (Double, Boolean, Int) =
          { case (isReverse, left, signed) => (-signed, isReverse, left) }
        val rankOrd: Ordering[(Double, Boolean, Int)] = Ordering.Tuple3(
          Ordering.Double.TotalOrdering, Ordering.Boolean, Ordering.Int)
        val heap = scala.collection.mutable.PriorityQueue
          .empty[(Boolean, Int, Double)](Ordering.by(rank))
        slim.foreach { t =>
          // head is the WORST kept candidate; skip worse-or-equal arrivals
          if (heap.size < cfg.topK) heap.enqueue(t)
          else if (rankOrd.lt(rank(t), rank(heap.head))) {
            heap.enqueue(t)
            heap.dequeue()
          }
        }
        heap.toVector.sortBy(rank).map { case (isReverse, left, signed) =>
          val db = if (isReverse) rev else genome
          val (_, scores) = SimilarityKernels.blendedScore(cfg.weights, gene, db, left, kcfg)
          val c = MatchCandidate(left, left + gene.length - 1, isReverse, genome.length, signed)
          val score = if (cfg.ascending) -c.weightedSimilarity else c.weightedSimilarity
          (genomeId,
            ScanHit(name, c.isReverse, c.left, c.right, c.start, c.end, score, scores))
        }
      }
    }
  }

  /** Distributed scan of `genes` (name → lowercase sequence) against a
    * genome. Result: top-k [[ScanHit]]s per gene, deterministic order
    * (gene, score desc, strand, left).
    */
  def scan(
      spark: SparkSession,
      genome: String,
      genes: Seq[(String, String)],
      cfg: ScanConfig): Dataset[ScanHit] = {
    import spark.implicits._
    val revStr = Dna.reverseComplement(genome)
    val cfgB = spark.sparkContext.broadcast(cfg)
    // byte copies for the hot path (see scanChunkSlimBytes) — converted
    // ONCE here, not per task; ISO-8859-1 is an exact byte map for the
    // ASCII DNA text. In byte mode ONLY the byte arrays broadcast — the
    // String forms the reduce stage needs (once per gene, for the final
    // ≤topK kernel evals) are rebuilt lazily per executor from the bytes;
    // shipping both representations doubles the dominant fixed cost of a
    // scan call (broadcast serialization) for no reader.
    val useBytes = byteEligible(cfg)
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val genomeLength = genome.length
    val fwd = spark.sparkContext.broadcast(if (useBytes) "" else genome)
    val rev = spark.sparkContext.broadcast(if (useBytes) "" else revStr)
    val fwdBytes = spark.sparkContext.broadcast(
      if (useBytes) genome.getBytes(iso) else Array.emptyByteArray)
    val revBytes = spark.sparkContext.broadcast(
      if (useBytes) revStr.getBytes(iso) else Array.emptyByteArray)

    val tasks = for {
      (name, gene) <- genes
      isReverse <- Seq(false, true)
      (s, e) <- chunks(genome.length, cfg.numChunks)
    } yield (name, gene, isReverse, s, e)

    val parallelism = math.min(tasks.size, spark.sparkContext.defaultParallelism * 2)
    val genesB = spark.sparkContext.broadcast(genes.toMap)

    // map stage emits SLIM survivors (two primitives + strand); the
    // per-kernel score maps — the dominant shuffle payload at flagship
    // topK=1000 (chunks×topK map objects) — are computed once, for the
    // ≤topK FINAL survivors per gene, in the reduce stage below
    // parallelize slices the task list directly — equal-cost chunks need no
    // round-robin repartition, and skipping it drops a stage + barrier from
    // every scan call
    spark.createDataset(
        spark.sparkContext.parallelize(tasks, math.max(parallelism, 1)))
      .flatMap { case (name, gene, isReverse, s, e) =>
        val survivors =
          if (useBytes) {
            val db = if (isReverse) revBytes.value else fwdBytes.value
            scanChunkSlimBytes(
              gene.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
              db, isReverse, s, e, cfgB.value)
          } else {
            val db = if (isReverse) rev.value else fwd.value
            scanChunkSlim(gene, db, isReverse, s, e, cfgB.value)
          }
        survivors.map { case (signed, left) => (name, isReverse, left, signed) }
      }
      .groupByKey(_._1)
      .flatMapGroups { (name, it) =>
        val cfg = cfgB.value
        val gene = genesB.value(name)
        val useB = byteEligible(cfg)
        // byte mode scores final survivors straight off the byte
        // broadcasts (blendedScoreB) — no String copies materialize
        val geneB =
          if (useB) gene.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          else Array.emptyByteArray
        val runLen = new Array[Int](gene.length + 1)
        val runEnd = new Array[Int](gene.length + 1)
        val dpBuf = new Array[Int]((gene.length + 1) * (gene.length + 1))
        val dbLength = if (useB) fwdBytes.value.length else fwd.value.length
        val kcfg = SimilarityKernels.KernelConfig(
          maxPatience = cfg.patience,
          continuousMismatchLimit = cfg.continuousMismatchLimit,
          pattern =
            if (cfg.hasPattern) Some(MatchPattern(gene, cfg.mustConditions, cfg.optionalConditions))
            else None)
        // bounded top-k over the slim tuples themselves — same rank as
        // Suppression.topK ((-score, strand, left)); MatchCandidate (and
        // its kernel score map) materializes only for the final ≤topK
        val rank: ((Boolean, Int, Double)) => (Double, Boolean, Int) =
          { case (isReverse, left, signed) => (-signed, isReverse, left) }
        val rankOrd: Ordering[(Double, Boolean, Int)] = Ordering.Tuple3(
          Ordering.Double.TotalOrdering, Ordering.Boolean, Ordering.Int)
        val heap = scala.collection.mutable.PriorityQueue
          .empty[(Boolean, Int, Double)](Ordering.by(rank))
        it.foreach { case (_, isReverse, left, signed) =>
          val t = (isReverse, left, signed)
          // head is the WORST kept candidate; skip worse-or-equal arrivals
          if (heap.size < cfg.topK) heap.enqueue(t)
          else if (rankOrd.lt(rank(t), rank(heap.head))) {
            heap.enqueue(t)
            heap.dequeue()
          }
        }
        heap.toVector.sortBy(rank).iterator.map { case (isReverse, left, signed) =>
          val (_, scores) =
            if (useB)
              SimilarityKernels.blendedScoreB(cfg.weights, geneB,
                if (isReverse) revBytes.value else fwdBytes.value, left,
                cfg.patience, runLen, runEnd, dpBuf)
            else
              SimilarityKernels.blendedScore(cfg.weights, gene,
                if (isReverse) rev.value else fwd.value, left, kcfg)
          val c = MatchCandidate(left, left + gene.length - 1, isReverse, dbLength, signed)
          val score = if (cfg.ascending) -c.weightedSimilarity else c.weightedSimilarity
          ScanHit(name, c.isReverse, c.left, c.right, c.start, c.end, score, scores)
        }
      }
  }
}
