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
    */
  def scanChunk(
      gene: String,
      db: String,
      isReverse: Boolean,
      chunkStart: Int,
      chunkEnd: Int,
      cfg: ScanConfig): Vector[MatchCandidate] = {
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

    val raw = Iterator.range(chunkStart, end).map { offset =>
      val (blended, scores) =
        SimilarityKernels.blendedScore(cfg.weights, gene, db, offset, kcfg)
      val signed = if (cfg.ascending) -blended else blended
      MatchCandidate(offset, offset + geneLength - 1, isReverse, dbLength, signed, scores)
    }
    Suppression.topK(
      Suppression.suppress(raw, cfg.candidateDistance, dropNonPositive = !cfg.ascending),
      cfg.topK)
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
    val fwd = spark.sparkContext.broadcast(genome)
    val rev = spark.sparkContext.broadcast(Dna.reverseComplement(genome))
    val cfgB = spark.sparkContext.broadcast(cfg)

    val tasks = for {
      (name, gene) <- genes
      isReverse <- Seq(false, true)
      (s, e) <- chunks(genome.length, cfg.numChunks)
    } yield (name, gene, isReverse, s, e)

    val parallelism = math.min(tasks.size, spark.sparkContext.defaultParallelism * 2)

    spark.createDataset(tasks)
      .repartition(math.max(parallelism, 1))
      .flatMap { case (name, gene, isReverse, s, e) =>
        val db = if (isReverse) rev.value else fwd.value
        scanChunk(gene, db, isReverse, s, e, cfgB.value).map(c => (name, c))
      }
      .groupByKey(_._1)
      .flatMapGroups { (name, it) =>
        val cfg = cfgB.value
        Suppression.topK(it.map(_._2), cfg.topK).map { c =>
          val score = if (cfg.ascending) -c.weightedSimilarity else c.weightedSimilarity
          ScanHit(name, c.isReverse, c.left, c.right, c.start, c.end, score, c.similarityScores)
        }
      }
  }
}
