package graft

import org.apache.spark.sql.SparkSession

/** Shared session tuning for every graft entry point (Bench, Verify, Main,
  * and the measurement mains), so the engine's plans are the same plans at
  * every surface.
  *
  * `spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold` (guide §3.1):
  * lets AQE rewrite a planned SortMergeJoin into a ShuffledHashJoin at
  * runtime when EVERY post-shuffle partition of the build side is under
  * the threshold — removing both sides' sorts. Spark ships it OFF (0).
  * Measured here (r20, sf100 envelope, dd_canonical_routed — the routed
  * dedup verify joins attach hashed-shingle arrays to candidate pairs):
  * the SMJ sorts of the ~5 GB array-carrying side spilled 16.4 GB per run
  * and the arm read 163.2 s; at 128m AQE converts those joins to SHJ
  * (build side = the sub-256 MB per-partition side, zero sorts) and the
  * SAME arm reads 69.0 s (2.4×). Gate-scale plans are unaffected — at
  * sf0.1 every join already broadcasts (zero SMJ in the suite), and the
  * rewrite only fires where runtime partition sizes say it is safe.
  *
  * The decision input is the POST-SHUFFLE PER-PARTITION size, so the knob
  * is scale-adaptive rather than local-tuned: growing data with a fixed
  * threshold just leaves oversized joins on the spill-graceful SMJ path.
  * Memory bound: each concurrent task may build a hash map up to the
  * threshold, so size it as (execution memory / cores) with slack —
  * 128m × 32 cores = 4 GB against this box's 8 GB heap; a production
  * 4-8-core executor wants the same 128-256m against its own heap.
  * Override with SPARK_GRAFT_SHJ_THRESHOLD (e.g. "0" restores stock
  * behavior).
  */
object SessionTuning {
  val ShjThresholdKey = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"

  def shjThreshold: String =
    sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "128m")

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    b.config(ShjThresholdKey, shjThreshold)
}
