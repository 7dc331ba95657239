package graft.bio

import org.apache.spark.sql.{Dataset, SparkSession}

/** A top-k scan hit enriched with its annotation classifications (stage 5
  * of the flagship pipeline, SURVEY §3.1).
  */
final case class LocatedHit(
    name: String,
    start: Int,
    end: Int,
    isReverse: Boolean,
    weightedSimilarity: Double,
    scores: Map[String, Double],
    geneTrack: String,
    targetTrack: String,
    matchTrack: String,
    locations: Seq[LocationHit])

/** W4/G1 — a maximal consistency run re-anchored to genome coordinates,
  * plus its own location classification and the F4 span-filter verdict.
  */
final case class SubHit(
    name: String,
    parentStart: Int,
    parentEnd: Int,
    start: Int,
    end: Int,
    maskLeft: Int,   // 1-based position within the parent window
    maskRight: Int,
    locations: Seq[LocationHit],
    passesSpanFilter: Boolean)

/** The flagship pipeline 1+2 (reference `src/1-run_gene_similarity_match.py`
  * traced in SURVEY §3.1): sliding-window scan (W1) → kernels (X1–X7) →
  * suppression + top-k (T1) → alignment render (X6) → interval probe +
  * classify (J1) → sub-hit extraction (W4/G1) → 5' span filter (F4).
  *
  * Stage layout per SURVEY §3.1 "Spark re-expression": the scan
  * parallelizes over gene × strand × chunk against a broadcast genome;
  * renders and probes run only on the ≤ topK survivors (projection after
  * limit — cheap); the annotation index is a broadcast sorted array.
  */
object SimilarityPipeline {

  /** W4 — positions of consistency sub-runs: scan the '*'/'.' mask for runs
    * whose length reaches `bestCnt`; emit the run's (startIdx, endIdx)
    * 0-based inclusive mask indices at the moment the count is reached.
    * '-' (bridged gap) neither extends nor resets a run — reference quirk
    * (`gene_location_analysis.py:116-130` handles only '*' and '.').
    */
  def subRuns(mask: String, bestCnt: Int): Seq[(Int, Int)] = {
    if (bestCnt <= 0) return Nil
    val out = Vector.newBuilder[(Int, Int)]
    var cur = 0
    var start = -1
    var i = 0
    while (i < mask.length) {
      mask.charAt(i) match {
        case '*' =>
          if (cur == 0) start = i
          cur += 1
          if (cur == bestCnt) out += ((start, i))
        case '.' => cur = 0
        case _   => () // '-' leaves the run count untouched
      }
      i += 1
    }
    out.result()
  }

  /** F4 — keep a sub-hit iff it lies within `[geneStart-span._1,
    * geneStart+span._2]` (orientation-aware) of a 5' location (reference
    * `pass_filter_sub_location`, `gene_location_analysis.py:84-102`); hits
    * whose first location is not 5' always pass.
    */
  def passesSpanFilter(
      locations: Seq[LocationHit],
      subStart: Int,
      subEnd: Int,
      span: Option[(Int, Int)]): Boolean = span match {
    case None => true
    case Some((before, after)) =>
      locations.headOption match {
        case Some(first) if first.kind == "5'" =>
          val gs = first.recordStart
          val ge = first.recordEnd
          if (gs < ge) {
            val (lo, hi) = (gs - before, gs + after)
            lo <= subStart && subStart <= subEnd && subEnd <= hi
          } else {
            val (hi, lo) = (gs + before, gs - after)
            hi >= subStart && subStart >= subEnd && subEnd >= lo
          }
        case _ => true
      }
  }

  /** Run the full pipeline. `annotations` must be the raw (unsorted is
    * fine) interval records; genome strings are broadcast once.
    */
  def run(
      spark: SparkSession,
      genome: String,
      genes: Seq[(String, String)],
      annotations: Seq[InterRecord],
      cfg: ScanConfig,
      filterSubSpan: Option[(Int, Int)] = None): (Dataset[LocatedHit], Dataset[SubHit]) = {
    import spark.implicits._

    val hits = GenomeScan.scan(spark, genome, genes, cfg)
    val fwd = spark.sparkContext.broadcast(genome)
    val rev = spark.sparkContext.broadcast(Dna.reverseComplement(genome))
    val ann = spark.sparkContext.broadcast(annotations.sortBy(_.start).toArray)
    val geneSeq = spark.sparkContext.broadcast(genes.toMap)
    val patience = cfg.patience
    val spanB = spark.sparkContext.broadcast(filterSubSpan)

    val located: Dataset[LocatedHit] = hits.map { h =>
      val db = if (h.isReverse) rev.value else fwd.value
      val gene = geneSeq.value(h.name)
      val render = SimilarityKernels.consistencyRender(gene, db, h.left, patience)
      LocatedHit(h.name, h.start, h.end, h.isReverse, h.weightedSimilarity, h.scores,
        render.gene, render.target, render.marks,
        IntervalLocation.locate(ann.value, h.start, h.end))
    }

    val subs: Dataset[SubHit] = located.flatMap { h =>
      val bestCnt = h.scores.get("consistency").map(_.toInt).getOrElse(0)
      val step = if (h.start < h.end) 1 else -1
      subRuns(h.matchTrack, bestCnt).map { case (runStart, runEnd) =>
        val subStart = h.start + step * runStart
        val subEnd = h.start + step * runEnd
        val locations = IntervalLocation.locate(ann.value, subStart, subEnd)
        SubHit(h.name, h.start, h.end, subStart, subEnd,
          runStart + 1, runEnd + 1, locations,
          passesSpanFilter(locations, subStart, subEnd, spanB.value))
      }
    }

    (located, subs)
  }
}
