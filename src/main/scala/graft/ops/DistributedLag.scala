package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** Distributed global lag (the scale-safe replacement for
  * `lag(v).over(Window.orderBy(...))` with no partition key, which funnels
  * the whole input through ONE partition).
  *
  * Same two-phase shape as [[GlobalOrder]]: range-repartition on the sort
  * key (partition p holds keys strictly below partition p+1), sort within
  * partitions, then run one tiny job collecting each partition's LAST
  * `valueCol` — one scalar per partition, never the rows — and feed
  * partition p the last value of the nearest non-empty partition before it
  * as the lag seed for its first row. Every row-bearing stage is parallel
  * over the full cluster.
  *
  * Like `RDD.zipWithIndex`, the sorted lineage is evaluated twice (once for
  * the boundary pass, once for the output); callers looping over the result
  * should persist upstream.
  */
object DistributedLag {

  /** `df` plus `lagCol` = previous row's `valueCol` in the global
    * `sortCols` order (`default` for the very first row). The sort key must
    * be a total order for the result to be deterministic — same contract as
    * a global `lag` window. A numeric `default` is coerced to `valueCol`'s
    * exact runtime type — the lag column shares the value column's dataType,
    * and an `Int 0` landing in (say) a Double field would produce a row the
    * encoder rejects at read time.
    */
  def withLag(
      df: DataFrame,
      valueCol: String,
      lagCol: String,
      default: Any,
      sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val valueField = df.schema(valueCol)
    val default0: Any = default match {
      case n: Number => valueField.dataType match {
        case LongType => n.longValue()
        case IntegerType => n.intValue()
        case ShortType => n.shortValue()
        case ByteType => n.byteValue()
        case DoubleType => n.doubleValue()
        case FloatType => n.floatValue()
        case _: DecimalType => new java.math.BigDecimal(n.toString)
        case _ => default
      }
      case _ => default
    }
    val schema = StructType(sorted.schema.fields :+
      valueField.copy(name = lagCol, nullable = valueField.nullable || default == null))
    val valueIdx = sorted.schema.fieldIndex(valueCol)

    val rdd = sorted.rdd
    val lasts: Map[Int, Any] = rdd.mapPartitionsWithIndex { (pid, it) =>
      var last: Any = null
      var any = false
      while (it.hasNext) { last = it.next().get(valueIdx); any = true }
      if (any) Iterator((pid, last)) else Iterator.empty
    }.collect().toMap

    val n = rdd.getNumPartitions
    val carryIn = new Array[Any](math.max(n, 1))
    var acc = default0
    var p = 0
    while (p < n) {
      carryIn(p) = acc
      acc = lasts.getOrElse(p, acc)
      p += 1
    }

    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var prev = carryIn(pid)
      it.map { row =>
        val r = Row.fromSeq(row.toSeq :+ prev)
        prev = row.get(valueIdx)
        r
      }
    }
    spark.createDataFrame(out, schema)
  }
}
