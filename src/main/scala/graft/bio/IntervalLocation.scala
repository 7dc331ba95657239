package graft.bio

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Interval annotation record (reference `EcocycInterRecord`,
  * `src/utils/ecocyc_data_loader.py:86-96`): `direction` is derived from
  * the raw start/end order ('>' iff start<end); `left/right` are the
  * normalized endpoints.
  */
final case class InterRecord(
    name: String,
    product: String,
    start: Int,
    end: Int,
    isGene: Boolean) {
  val direction: Char = if (start < end) '>' else '<'
  val left: Int = math.min(start, end)
  val right: Int = math.max(start, end)
}

/** One classified overlap between a hit interval and an annotation. */
final case class LocationHit(
    kind: String,              // 5' | 3' | cds | cover | inter-genic
    name: String,              // record name, or "L, R" flank names for inter-genic
    product: String,
    recordStart: Int,
    recordEnd: Int,
    isGene: Boolean,
    originalDirections: String,
    intersectDirections: String)

/** J1 — interval-overlap probe + 8-way classification + W5 decile render
  * (reference `src/analysis/gene_location_analysis.py:149-304,421-437`),
  * and J8 — range→gene classification (`src/utils/gene_position_helper.py`).
  *
  * Scale design: the annotation side is dictionary-sized (4,553 rows for
  * E. coli) → broadcast a sorted array and probe with binary search inside
  * a `flatMap` — the exact parity semantics including the ±2/+3 probe
  * window and nearest-flank tracking, at zero shuffle cost. When both
  * sides are large, [[graft.ops.RangeJoin]] is the scale path (bucketed
  * equi-join); its classification CASE is this same [[intervalCheck]].
  */
object IntervalLocation {

  /** The 8-way interval relation (reference enum
    * `gene_location_analysis.py:421-437`; classifier `:278-304`).
    * Probe interval [left,right] vs record [recordLeft,recordRight].
    */
  sealed trait PositionStatus
  case object TotallyLeft extends PositionStatus    // record entirely right of probe
  case object IntersectLeft extends PositionStatus  // probe overhangs record's left edge
  case object CoverLeft extends PositionStatus      // probe covers record, extends left
  case object Inner extends PositionStatus          // probe inside record
  case object CoverRight extends PositionStatus     // probe covers record, extends right
  case object IntersectRight extends PositionStatus // probe overhangs record's right edge
  case object TotallyRight extends PositionStatus   // record entirely left of probe
  case object Cover extends PositionStatus          // probe strictly covers record

  /** Direct port of the reference's decision tree INCLUDING its branch
    * order — the `CoverLeft` vs `Cover` overlap (both can describe
    * `left < recordLeft && recordRight <= right`) resolves in favor of
    * CoverLeft exactly as the reference's earlier branch wins.
    */
  def intervalCheck(recordLeft: Int, recordRight: Int, left: Int, right: Int): PositionStatus = {
    if (right < recordLeft) TotallyLeft
    else if (left < recordLeft && recordLeft <= right && right < recordRight) IntersectLeft
    else if (left < recordLeft && recordLeft <= recordRight && recordRight <= right) CoverLeft
    else if (recordLeft <= left && left <= right && right <= recordRight) Inner
    else if (left <= recordLeft && recordLeft <= recordRight && recordRight < right) CoverRight
    else if (recordLeft < left && left <= recordRight && recordRight < right) IntersectRight
    else if (recordRight < left) TotallyRight
    else if (left < recordLeft && recordLeft <= recordRight && recordRight < right) Cover
    else throw new IllegalArgumentException(
      s"[$recordLeft,$recordRight] <-> [$left,$right]")
  }

  /** Overlap length of two inclusive segments (reference `count_coverage`,
    * `gene_location_analysis.py:406-415`).
    */
  def countCoverage(aLeft: Int, aRight: Int, bLeft: Int, bRight: Int): Int = {
    val (l1, r1, l2, r2) =
      if (aLeft > bLeft) (bLeft, bRight, aLeft, aRight) else (aLeft, aRight, bLeft, bRight)
    if (r2 <= r1) r2 - l2 + 1
    else if (l2 <= r1) r1 - l2 + 1
    else 0
  }

  /** Binary search: first index whose `start` >= value (reference
    * `binary_search_first_le`, `ecocyc_data_loader.py:43-50` — the name
    * says LE but the code finds first-greater-equal; we keep the behavior,
    * not the name).
    */
  def findFirstLe(records: Array[InterRecord], value: Int): Int = {
    var lo = 0
    var hi = records.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (records(mid).start >= value) hi = mid else lo = mid + 1
    }
    lo
  }

  /** W5 decile coverage track: split the record into 10 parts (or
    * record-length parts when shorter than 10), mark '*' where the probe
    * covers >50% of the part, else the record's direction character.
    * Reference `render_location_result`, `gene_location_analysis.py:213-240`.
    */
  def coverageTracks(record: InterRecord, left: Int, right: Int): (String, String) = {
    val recordLen = record.right - record.left + 1
    var partLen = recordLen / 10
    var maxDraw = 10
    if (partLen == 0) { partLen = 1; maxDraw = recordLen }
    val intersect = new java.lang.StringBuilder(maxDraw)
    val original = new java.lang.StringBuilder(maxDraw)
    var idx = 0
    while (idx < maxDraw) {
      val rLeft = record.left + idx * partLen
      val rRight = if (idx < maxDraw - 1) rLeft + partLen - 1 else record.right
      val coverage = countCoverage(left, right, rLeft, rRight) * 100.0 / partLen
      intersect.append(if (coverage > 50.0) '*' else record.direction)
      original.append(record.direction)
      idx += 1
    }
    (original.toString, intersect.toString)
  }

  /** The J1 probe: binary-search the sorted records for the hit's `start`
    * (raw, strand-encoded), inspect records [idx−2, idx+3), classify each
    * and render; when nothing overlaps, emit one `inter-genic` row naming
    * the nearest flanking records. Reference `get_location_information`
    * (`gene_location_analysis.py:149-204`) — including its nearest-flank
    * selection rules (max right among TotallyRight, min left among
    * TotallyLeft).
    */
  def locate(records: Array[InterRecord], start: Int, end: Int): Seq[LocationHit] = {
    val left = math.min(start, end)
    val right = math.max(start, end)
    val idx = findFirstLe(records, start)
    val findLeft = math.max(idx - 2, 0)
    val findRight = math.min(idx + 3, records.length)
    val out = Vector.newBuilder[LocationHit]
    var leftNearest: InterRecord = null
    var rightNearest: InterRecord = null
    var any = false
    var index = findLeft
    while (index < findRight) {
      val r = records(index)
      val status = intervalCheck(r.left, r.right, left, right)
      val kind: String = status match {
        case IntersectLeft | CoverLeft   => if (r.direction == '>') "5'" else "3'"
        case IntersectRight | CoverRight => if (r.direction == '>') "3'" else "5'"
        case Inner                       => "cds"
        case Cover                       => "cover"
        case TotallyLeft =>
          if (rightNearest == null || rightNearest.left > r.left) rightNearest = r
          "inter-genic"
        case TotallyRight =>
          if (leftNearest == null || leftNearest.right < r.right) leftNearest = r
          "inter-genic"
      }
      if (kind != "inter-genic") {
        val (orig, inter) = coverageTracks(r, left, right)
        out += LocationHit(kind, r.name, r.product, r.start, r.end, r.isGene, orig, inter)
        any = true
      }
      index += 1
    }
    if (!any) {
      val ln = if (leftNearest == null) "None" else leftNearest.name
      val rn = if (rightNearest == null) "None" else rightNearest.name
      out += LocationHit("inter-genic", s"$ln, $rn", "", 0, 0, isGene = false, "", "")
    }
    out.result()
  }

  /** Reference-format text render of one location hit
    * (`gene_location_analysis.py:213-240`) — used by golden tests and the
    * block-text sink.
    */
  def renderLocation(hit: LocationHit): String = {
    if (hit.kind == "inter-genic" && hit.originalDirections.isEmpty)
      s"inter-genic of ${hit.name}"
    else {
      val tail =
        if (hit.isGene)
          s"${hit.recordStart}-${hit.recordEnd}\tgene=${hit.name}\tproduct=${hit.product}"
        else
          s"${hit.recordStart}-${hit.recordEnd}\tpromoter=${hit.name}"
      s"${hit.kind} of ${hit.name}\n" +
        s"original direction  : ${hit.originalDirections}\n" +
        s"intersect direction : ${hit.intersectDirections}\n" + tail
    }
  }

  /** Distributed form: hits (columns `start`, `end` + passthrough) against
    * a broadcast annotation array; one output row per classified overlap.
    * At the reference's annotation scale this is the right plan — no
    * shuffle, no join, perfect pushdown; swap in RangeJoin when the
    * annotation side stops fitting in a broadcast.
    */
  def locateHits(
      spark: SparkSession,
      hits: DataFrame,
      records: Seq[InterRecord]): Dataset[(Int, Int, LocationHit)] = {
    import spark.implicits._
    val sorted = records.sortBy(_.start).toArray
    val b = spark.sparkContext.broadcast(sorted)
    hits.select("start", "end").as[(Int, Int)].flatMap { case (s, e) =>
      locate(b.value, s, e).map(h => (s, e, h))
    }
  }

  // ----------------------------------------------------------------- J8

  /** Range→gene classification (reference `gene_position_helper.py:93-117`). */
  def rangeGeneType(rangeLeft: Int, rangeRight: Int, geneLeft: Int, geneRight: Int): String = {
    if (rangeLeft == geneLeft && rangeRight == geneRight) "hit"
    else {
      val overlap = overlapSize(rangeLeft, rangeRight, geneLeft, geneRight)
      val rate = overlap * 100.0 / (rangeRight - rangeLeft + 1)
      if (rate >= 90.0) "homology"
      else if (geneLeft <= rangeLeft && rangeRight <= geneRight) "include"
      else "related"
    }
  }

  def overlapSize(rangeLeft: Int, rangeRight: Int, geneLeft: Int, geneRight: Int): Int = {
    if (rangeRight < geneLeft || rangeLeft > geneRight) 0
    else if (rangeRight < geneRight) rangeRight - geneLeft + 1
    else geneRight - rangeLeft + 1
  }

  /** First index with segment-left >= pos over a sorted-by-left array
    * (reference `GeneDatabase.find_first_greater_equal`,
    * `gene_database.py:13-24` — returns length when all are smaller).
    */
  def findFirstGE(lefts: Array[Int], pos: Int): Int = {
    var lo = 0
    var hi = lefts.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lefts(mid) < pos) lo = mid + 1 else hi = mid
    }
    if (lefts(hi) >= pos) hi else hi + 1
  }

  /** J8 probe (reference `get_nearby_gene_based_by_range:18-43`): candidate
    * genes via two binary searches; a single covering gene wins alone, else
    * all candidates emit, each classified by [[rangeGeneType]].
    * `segments` sorted by left; returns (segmentIndex, type) pairs.
    */
  def nearbyGenesByRange(
      lefts: Array[Int],
      rights: Array[Int],
      left: Int,
      right: Int): Seq[(Int, String)] = {
    val leftGe = findFirstGE(lefts, left)
    val rightLt = findFirstGE(lefts, right) - 1
    val candidates: Seq[Int] =
      if (leftGe == rightLt) Seq(leftGe)
      else if (leftGe < rightLt) {
        val range = leftGe to rightLt
        range.find(i => lefts(i) <= left && rights(i) >= right)
          .map(Seq(_)).getOrElse(range.toSeq)
      } else {
        require(leftGe - 1 == rightLt, s"leftGe-1 != rightLt ($leftGe, $rightLt)")
        val pair = Seq(rightLt, leftGe)
        pair.find(i => lefts(i) <= left && rights(i) >= right)
          .map(Seq(_)).getOrElse(pair)
      }
    candidates.filter(i => i >= 0 && i < lefts.length)
      .map(i => (i, rangeGeneType(left, right, lefts(i), rights(i))))
  }
}
