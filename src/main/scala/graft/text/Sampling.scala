package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling for train/eval splits — the assignment step a
  * training-data pipeline runs after filtering and dedup.
  *
  * Hash-based (not random): a document's bucket is a pure function of its
  * id, so splits are reproducible across runs and engines, stable under
  * corpus growth (adding docs never moves an existing doc between
  * splits), and need no coordination — the classic content-addressed
  * split. At 100 TB this is scan-stage compute: a codegen'd arithmetic
  * expression per row, no shuffle, no state.
  */
object Sampling {

  /** Bucket in [0, buckets): multiplicative hash of the id (Knuth's
    * 2654435761 spread constant) reduced mod a large prime, then mod the
    * bucket count — id-order patterns don't survive into buckets.
    *
    * The id is reduced mod the prime BEFORE the multiply: `pmod(id, p)` <
    * 2^30 keeps the product under 2^62, so the hash is overflow-free (and
    * identical across engines) for the full BIGINT id domain — a bare
    * `id * 2654435761` wraps silently in Spark above ~3.47e9 while the
    * DuckDB oracle raises a BIGINT overflow on the same expression.
    */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(pmod(id, lit(TextOps.HashPrime)) * lit(2654435761L), lit(TextOps.HashPrime)) % buckets

  /** Percentage-split label over [[hashBucket]](id, 100):
    * `[0, trainPct)` → "train", `[trainPct, trainPct+valPct)` →
    * "validation", rest → "test".
    */
  def hashSplit(id: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    val b = hashBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "validation")
      .otherwise("test")
  }
}
