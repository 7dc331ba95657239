package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual escape hatch for the one
  * case AQE's runtime skew handling does not cover: a single hot key in a
  * shuffle whose other side cannot be broadcast. AQE splits oversized
  * sort-merge partitions but each split still re-reads the SAME hot-key
  * rows of the other side; salting instead spreads the hot key across
  * `salts` genuinely independent partitions at the cost of replicating
  * the (smaller, but not broadcastable) right side ×salts.
  *
  * Used when: left is huge AND skewed on the join key, right is too big
  * for `broadcast()` but ×salts replication is still cheaper than one
  * straggler task processing the hot key alone.
  */
object Salt {

  private val SaltCol = "__graft_salt"

  /** Inner/left-semi style equi-join with a salted left side.
    *
    * The salt is `monotonically_increasing_id % salts` — derived from row
    * POSITION, not value, so even a single key value occupying 90% of the
    * table spreads uniformly (a value-hash salt would keep hot rows
    * together). The right side is replicated once per salt value via a
    * posexplode-free literal array explode; the join key becomes
    * (keys..., salt), and the salt column never escapes.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLeft = left.withColumn(SaltCol,
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicatedRight = right.withColumn(SaltCol,
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(replicatedRight, keys :+ SaltCol, joinType)
      .drop(SaltCol)
  }

  /** Two-phase salted aggregation: partial-aggregate on (keys, salt),
    * merge on keys. Spark's map-side partial aggregation already does
    * this per TASK; the explicit salted phase adds a partial REDUCE tier,
    * which matters when one key's partials still overwhelm a single final
    * task (e.g. high-cardinality `collect_list`-style states). `partial`
    * builds the per-salt aggregates, `merge` combines them; the caller
    * guarantees merge∘partial ≡ direct aggregation (true for any
    * commutative monoid: sum/sum, count/sum, min/min, max/max).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      partial: Seq[(Column, String)],
      merge: String => Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = df.withColumn(SaltCol,
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val phase1 = salted.groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partial.head._1.as(partial.head._2),
        partial.tail.map { case (c, n) => c.as(n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(merge(partial.head._2).as(partial.head._2),
        partial.tail.map { case (_, n) => merge(n).as(n) }: _*)
  }
}
