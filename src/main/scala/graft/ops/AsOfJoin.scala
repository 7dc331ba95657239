package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (nearest-predecessor) join.
  *
  * Re-expression of the reference's nearest-neighbor gene probes
  * (`src/analysis/neighbor_analysis.py:171-199`,
  * `src/analysis/gene_stream_analysis.py:69-89`: "nearest annotation entirely
  * left of the hit") as the classic union + running-`last` window pattern:
  *
  *   1. tag right rows 0, left rows 1; union on (key, time, payload)
  *   2. window `partitionBy(key).orderBy(time, tag, tiebreak)` with
  *      `rowsBetween(unboundedPreceding, current)`
  *   3. `last(payload, ignoreNulls = true)` — for each left row this is the
  *      payload of the latest right row with `rightTime <= leftTime`
  *      (right rows sort before left rows at equal times, so ties match).
  *
  * Scale: ONE shuffle (the window's hash partitioning on `key`), no
  * broadcast, no nested loop — each key's rows are sorted once per
  * partition. Skewed keys are bounded by the window's external sort, and the
  * pattern is exactly what a 1000-executor as-of over 100 TB of events
  * needs: it degrades to a sort-merge within each key partition.
  */
object AsOfJoin {

  /** For each row of `left`, attach the payload columns of the latest `right`
    * row with the same `key` and `right(timeCol) <= left(timeCol)`.
    * Payload columns are emitted with the given `prefix`; unmatched rows get
    * nulls (left-outer semantics). `tiebreakCol` must totally order right
    * rows that share (key, time) — the greatest one wins.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      timeCol: String,
      payloadCols: Seq[String],
      prefix: String = "asof_",
      tiebreakCol: String = null): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(payloadCols.map(col): _*)
    val tb = Option(tiebreakCol).map(col).getOrElse(lit(0))

    val r = right.select(
      col(key).as("_k"), col(timeCol).as("_t"), lit(0).as("_side"),
      tb.as("_tb"), payload.as("_p"), lit(null).cast(left.schema).as("_l"))
    val l = left.select(
      col(key).as("_k"), col(timeCol).as("_t"), lit(1).as("_side"),
      lit(null).cast(r.schema("_tb").dataType).as("_tb"),
      lit(null).cast(r.schema("_p").dataType).as("_p"),
      struct(leftCols.map(col): _*).as("_l"))

    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = r.unionByName(l)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)

    val out = leftCols.map(c => col(s"_l.$c").as(c)) ++
      payloadCols.map(c => col(s"_m.$c").as(s"$prefix$c"))
    matched.select(out: _*)
  }
}
