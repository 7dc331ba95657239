package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed AGGREGATE (SURVEY §7.3 tier (b): custom
  * TypedColumn) — the scale-correct form of "top k per group" when the
  * group cardinality is LOW. A `row_number().over(Window.partitionBy(g))`
  * with 3 distinct groups funnels the whole table through 3 partitions;
  * an aggregate instead combines map-side — every input partition reduces
  * to ≤k rows per group BEFORE the shuffle, so the exchange carries
  * O(partitions × groups × k) slim rows no matter how large the input.
  * Same trick as the genome scan's per-chunk bounded heap, expressed as a
  * reusable Catalyst aggregation.
  *
  * The buffer is an unsorted vector compacted to the best k whenever it
  * reaches 2k — amortized O(log k) per row, safe for k in the thousands.
  * `finish` returns the k best in `ord` order (best first).
  */
final class BoundedTopK[T](k: Int, ord: Ordering[T], enc: Encoder[Seq[T]])
    extends Aggregator[T, Seq[T], Seq[T]] {
  require(k > 0, "k must be positive")

  private def compact(b: Seq[T]): Seq[T] = b.sorted(ord).take(k)

  def zero: Seq[T] = Vector.empty

  def reduce(b: Seq[T], a: T): Seq[T] = {
    val nb = b :+ a
    if (nb.size >= 2 * k) compact(nb) else nb
  }

  def merge(x: Seq[T], y: Seq[T]): Seq[T] = compact(x ++ y)

  def finish(r: Seq[T]): Seq[T] = compact(r)

  def bufferEncoder: Encoder[Seq[T]] = enc
  def outputEncoder: Encoder[Seq[T]] = enc
}
