package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global row numbering (the scale-safe replacement for
  * `row_number().over(Window.orderBy(...))` with no partition key, which
  * funnels the whole input through ONE partition).
  *
  * Two-phase plan: range-repartition on the sort key (so partition p holds
  * keys strictly below partition p+1), sort within partitions, then
  * `zipWithIndex` — which runs one small job to count rows per partition
  * and assigns each partition a starting offset (the prefix sum). Only the
  * per-partition COUNTS touch the driver, never the rows, and every stage
  * is parallel over the full cluster.
  *
  * The sort key must be a total order (unique) for the numbering to be
  * deterministic — same contract as a global `row_number`.
  */
object GlobalOrder {

  /** `df` plus a 1-based `ordCol` (long) numbering rows by `sortCols`. */
  def withRowNumber(df: DataFrame, ordCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(ordCol, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(indexed, schema)
  }
}
