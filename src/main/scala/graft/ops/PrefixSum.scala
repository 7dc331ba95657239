package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed running total (the scale-safe replacement for
  * `sum(v).over(Window.orderBy(...))` with no partition key, which funnels
  * the whole input through ONE partition).
  *
  * Same two-phase shape as [[GlobalOrder]] / [[DistributedLag]]:
  * range-repartition on the sort key, sort within partitions, then one tiny
  * job sums each partition (one scalar per partition to the driver) and the
  * exclusive prefix of those sums seeds each partition's running total.
  * Every row-bearing stage is parallel over the full cluster.
  *
  * The classic use is greedy contiguous sequence packing: with the running
  * total of token counts in hand, `pack_id = (running - v) / contextLen`
  * assigns documents to training context windows with no further shuffle.
  */
object PrefixSum {

  /** `df` plus `totalCol` = inclusive running sum of `valueCol` (read as a
    * long) in the global `sortCols` order. The sort key must be a total
    * order for the result to be deterministic.
    */
  def withRunningTotal(
      df: DataFrame,
      valueCol: String,
      totalCol: String,
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(totalCol, LongType, nullable = false))
    val valueIdx = sorted.schema.fieldIndex(valueCol)

    val rdd = sorted.rdd
    val partSums: Map[Int, Long] = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      while (it.hasNext) s += it.next().getAs[Number](valueIdx).longValue()
      Iterator((pid, s))
    }.collect().toMap

    val n = rdd.getNumPartitions
    val offsets = new Array[Long](math.max(n, 1))
    var acc = 0L
    var p = 0
    while (p < n) {
      offsets(p) = acc
      acc += partSums.getOrElse(p, 0L)
      p += 1
    }

    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = offsets(pid)
      it.map { row =>
        running += row.getAs[Number](valueIdx).longValue()
        Row.fromSeq(row.toSeq :+ running)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
