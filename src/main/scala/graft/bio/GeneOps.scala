package graft.bio

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.GeneSegment

/** The gene-centric operators around the flagship pipeline (SURVEY §2):
  * W2 flanking extraction, sequence-extract with the reverse-range shim,
  * W3 inter-genic gap emission, J2 nearest-neighbor probes, J3 directional
  * next-gene selection, A1 distribution counts.
  *
  * Pure functions carry the coordinate algebra (1-based inclusive,
  * `start>end` ⇒ reverse); DataFrame forms distribute them. The genome
  * string rides as a broadcast (reference data, never a shuffle key).
  */
object GeneOps {

  // ------------------------------------------------------------- W2 flanking

  /** Gene sequence + `limit`-bp up/downstream flanks; on the minus strand
    * all three are reverse-complemented and up/down SWAP (reference
    * `gene_stream_analysis.py:30-45` `work_for_gene_index`).
    */
  def flanking(dna: String, left: Int, right: Int, reverse: Boolean, limit: Int)
      : (String, String, String) = {
    val seq = dna.substring(left - 1, right)
    val up = dna.substring(math.max(left - limit - 1, 0), left - 1)
    val down = dna.substring(right, math.min(right + limit, dna.length))
    if (reverse)
      (Dna.reverseComplement(seq),
        Dna.reverseComplement(down),
        Dna.reverseComplement(up))
    else (seq, up, down)
  }

  /** The inter-gene UTR between two segments (reference `get_utr_between`,
    * `gene_stream_analysis.py:25-28` — note the asymmetric bounds: starts
    * AFTER prev.right, ends BEFORE next.left−1, replicated exactly).
    */
  def utrBetween(dna: String, prevRight: Int, nextLeft: Int): String =
    dna.substring(prevRight, math.max(nextLeft - 1, prevRight))

  // --------------------------------------------- sequence extract (GeneExtract)

  /** Range-based sequence extraction with the reference's reverse-range ±1
    * shim (`gene_extract.py:66-82`): forward ranges are [a−1, b−1) 0-based
    * half-open over the raw string (i.e. genome[a..b−1] 1-based!); reverse
    * ranges shift one right THEN reverse-complement. A quirk, but every
    * downstream consumer of the reference's extracts depends on it.
    */
  def extractRange(dna: String, a: Int, b: Int): String = {
    val (left0, right0) = (math.min(a, b) - 1, math.max(a, b) - 1)
    if (a < b) dna.substring(left0, right0)
    else Dna.reverseComplement(dna.substring(left0 + 1, right0 + 1))
  }

  // --------------------------------------------------- W3 gap (region) emission

  /** One row of the range report: either a gene or an inter-genic region
    * (reference `gene_range_analysis.py:24-39`).
    */
  final case class RangeRow(name: String, left: Int, right: Int, locusTag: Option[String])

  /** Walk segments in order and emit `region_i` rows for gaps (reference
    * semantics: `last_end` is the PREVIOUS segment's right — no running
    * max — and a trailing region runs to genome end).
    */
  def rangeRows(segments: Seq[GeneSegment], genomeLength: Int): Seq[RangeRow] = {
    val out = Vector.newBuilder[RangeRow]
    var lastEnd = 0
    var regionIdx = 0
    segments.zipWithIndex.foreach { case (seg, i) =>
      if (lastEnd < seg.left - 1) {
        regionIdx += 1
        out += RangeRow(s"region_$regionIdx", lastEnd + 1, seg.left - 1, None)
      }
      out += RangeRow(s"gene_${i + 1}", seg.left, seg.right, seg.locusTag)
      lastEnd = seg.right
    }
    if (lastEnd < genomeLength) {
      regionIdx += 1
      out += RangeRow(s"region_$regionIdx", lastEnd + 1, genomeLength, None)
    }
    out.result()
  }

  /** Distributed W3: the same gap emission as a global lag over an ordered
    * segment DataFrame (columns `left`, `right`) — via
    * [[graft.ops.DistributedLag]] (range-partitioned sort + per-partition
    * boundary carry), NOT an unpartitioned window, which would funnel every
    * segment through one partition. No driver loop — the 100 TB shape.
    */
  def gapsDF(segments: DataFrame, orderCol: String): DataFrame = {
    graft.ops.DistributedLag
      .withLag(segments, "right", "prev_right", 0, col(orderCol))
      .where(col("prev_right") < col("left") - 1)
      .select((col("prev_right") + 1).as("gap_left"), (col("left") - 1).as("gap_right"))
  }

  // ------------------------------------------------ J2 nearest-neighbor probes

  /** For interval [left,right]: the nearest segment entirely left
    * (max right ≤ left), nearest entirely right (min left ≥ right), and
    * all segments covering either endpoint (reference
    * `neighbor_analysis.py:171-199` `analysis_download_file`).
    * Tie behavior replicated: strict comparisons keep the FIRST
    * encountered among equals.
    */
  def neighborProbe(
      segments: Seq[GeneSegment],
      left: Int,
      right: Int): (Option[GeneSegment], Option[GeneSegment], Seq[GeneSegment]) = {
    var nearSmall: GeneSegment = null
    var nearBig: GeneSegment = null
    val covering = Vector.newBuilder[GeneSegment]
    segments.foreach { seg =>
      if (seg.right <= left && (nearSmall == null || nearSmall.right < seg.right))
        nearSmall = seg
      if (seg.left >= right && (nearBig == null || nearBig.left > seg.left))
        nearBig = seg
      if ((seg.left <= left && left <= seg.right) || (seg.left <= right && right <= seg.right))
        covering += seg
    }
    (Option(nearSmall), Option(nearBig), covering.result().distinct)
  }

  /** Distributed J2 (hits × segments, per accession): `max_by`/`min_by`
    * aggregations after a range-bucketed or broadcast join — here the
    * broadcast form for dictionary-sized annotation sides.
    */
  def nearestFlanksDF(hits: DataFrame, segments: DataFrame): DataFrame = {
    val s = broadcast(segments.select(
      col("gene").as("seg_gene"), col("left").as("seg_left"), col("right").as("seg_right")))
    val leftSide = hits.join(s, col("seg_right") <= col("left"))
      .groupBy("hit_id")
      .agg(max_by(struct(col("seg_gene"), col("seg_left"), col("seg_right")), col("seg_right")).as("up"))
    val rightSide = hits.join(s, col("seg_left") >= col("right"))
      .groupBy("hit_id")
      .agg(min_by(struct(col("seg_gene"), col("seg_left"), col("seg_right")), col("seg_left")).as("down"))
    hits.join(leftSide, Seq("hit_id"), "left_outer")
      .join(rightSide, Seq("hit_id"), "left_outer")
  }

  // ------------------------------------------- J3 directional next-gene pick

  /** Is `gene` a better "next gene downstream in strand direction" than the
    * current `target`? (reference `check_gene`,
    * `neighbor_analysis.py:201-214`): '+' wants the min gene-left strictly
    * beyond the hit's right; '−' wants the max gene-right strictly before
    * the hit's left.
    */
  def isBetterNextGene(
      hitLeft: Int, hitRight: Int, direction: Char,
      geneLeft: Int, geneRight: Int,
      target: Option[(Int, Int)]): Boolean = direction match {
    case '-' =>
      val peer = math.min(hitLeft, hitRight)
      val genePeer = math.max(geneLeft, geneRight)
      peer > genePeer && target.forall { case (tl, tr) => math.max(tl, tr) < genePeer }
    case '+' =>
      val peer = math.max(hitLeft, hitRight)
      val genePeer = math.min(geneLeft, geneRight)
      peer < genePeer && target.forall { case (tl, tr) => math.min(tl, tr) > genePeer }
    case other => throw new IllegalArgumentException(s"direction must be + or -, got $other")
  }

  /** Fold a candidate list through [[isBetterNextGene]] in order — the
    * reference's sequential scan, exact including its order dependence.
    */
  def pickNextGene(
      hitLeft: Int, hitRight: Int, direction: Char,
      genes: Seq[(String, Int, Int)]): Option[(String, Int, Int)] = {
    var target: Option[(String, Int, Int)] = None
    genes.foreach { case (name, gl, gr) =>
      if (isBetterNextGene(hitLeft, hitRight, direction, gl, gr,
          target.map(t => (t._2, t._3))))
        target = Some((name, gl, gr))
    }
    target
  }

  // --------------------------------------------------- A1 distribution counts

  /** `key \t count \t pct%` rows, count-desc (reference
    * `neighbor_analysis.py:150-153` — the pct denominator is ALL rows,
    * including ones whose key was filtered out upstream).
    */
  def distributionCounts(df: DataFrame, keyCol: String, total: Long): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("pct", round(col("cnt") * 100.0 / total, 4))
      .orderBy(col("cnt").desc, col(keyCol))

  // ----------------------------------------------------- misc utilities

  /** `name:left-right(±)` locus parse (reference `gentamycin.py:88-93`). */
  private val locusRe = """(.+):(\d+)-(\d+)\((.)\)""".r

  def parseLocus(locus: String): (String, Int, Int, Char) = locus.trim match {
    case locusRe(name, l, r, d) => (name, l.toInt, r.toInt, d.head)
    case other => throw new IllegalArgumentException(s"bad locus: $other")
  }

  /** Synthetic jittered triples (reference `run_random_generate.py:17-23`):
    * two draws in `[0.975, 1.025]·target`, third balances to `3·target`.
    * Seeded for reproducibility (the reference uses an unseeded RNG —
    * determinism is an engine improvement, not a divergence the tests pin).
    */
  def randomTriples(targets: Seq[Double], seed: Long): Seq[(Double, Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    targets.map { t =>
      val a = (19.5 + rnd.nextDouble()) / 20 * t
      val b = (19.5 + rnd.nextDouble()) / 20 * t
      (a, b, 3 * t - a - b)
    }
  }
}
