package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * Re-expression of the reference's sorted-index + binary-search interval
  * probes (reference `src/utils/gene_database.py:10-24`,
  * `src/analysis/gene_location_analysis.py:149-204`) as a shuffle-friendly
  * **bin-bucketed range join**:
  *
  *   1. points get `bucket = floor(point / width)`
  *   2. intervals explode to every bucket they cover
  *      (`sequence(floor(start/w), floor(end/w))`)
  *   3. equi-join on `bucket` (hash join — sort-merge or broadcast, Catalyst
  *      picks), then post-filter `start <= point <= end`.
  *
  * Why this scales where a naive non-equi join does not: Catalyst plans a
  * bare `ON p BETWEEN s AND e` as BroadcastNestedLoopJoin — O(|P|·|I|) work.
  * The bucketed form is a plain equi-join: O(|P| + |I|·avgSpan/width) rows
  * shuffled, AQE-coalesced, and skew-handled like any other join. At 100 TB
  * both sides partition by bucket and co-locate; `width` trades duplication
  * of long intervals against bucket fan-in (pick ~= median interval length).
  *
  * When the interval side is dictionary-sized (the reference's 4,553-row
  * annotation table), prefer [[graft.ops.IntervalJoin]] (broadcast + binary
  * search) which also reproduces the reference's nearest-flank semantics.
  */
object RangeJoin {

  /** Join `points` to `intervals` where `pointCol ∈ [startCol, endCol]`
    * (inclusive both ends — the reference's intervals are 1-based inclusive).
    *
    * Interval-side columns are kept; the helper column `_bucket` is dropped.
    * Columns must not collide between the two sides.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val p = points.withColumn("_bucket", floor(col(pointCol) / w))
    val i = intervals.withColumn(
      "_bucket",
      explode(sequence(floor(col(startCol) / w), floor(col(endCol) / w))))
    p.join(i, "_bucket")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Plan-level variant of [[pointInInterval]]: installs
    * [[graft.plans.IntervalStabJoinStrategy]] (idempotent) and emits the
    * bare `p BETWEEN s AND e` predicate — the strategy plans a
    * range-partition + sorted-sweep physical join (IEJoin family) instead
    * of Catalyst's BroadcastNestedLoopJoin. Compared to the bucketed form:
    * no interval explosion, no residual bucket filter, and output work
    * proportional to true matches, with no `bucketWidth` to tune.
    */
  def pointInIntervalPlanned(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String): DataFrame = {
    graft.plans.IntervalStabJoinStrategy.register(points.sparkSession)
    points.join(
      intervals,
      col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
  }

  /** Interval-overlap join: pairs where [ls,le] and [rs,re] overlap.
    * Same bucket trick; the post-filter keeps true overlaps and the
    * `floor(greatest(ls,rs)/w) = bucket` guard deduplicates pairs that share
    * several buckets without a downstream `distinct()` (no extra shuffle).
    */
  def intervalOverlap(
      left: DataFrame,
      ls: String,
      le: String,
      right: DataFrame,
      rs: String,
      re: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val l = left.withColumn("_bucket", explode(sequence(floor(col(ls) / w), floor(col(le) / w))))
    val r = right.withColumn("_bucket", explode(sequence(floor(col(rs) / w), floor(col(re) / w))))
    l.join(r, "_bucket")
      .where(col(ls) <= col(re) && col(rs) <= col(le))
      .where(floor(greatest(col(ls), col(rs)) / w) === col("_bucket"))
      .drop("_bucket")
  }
}
