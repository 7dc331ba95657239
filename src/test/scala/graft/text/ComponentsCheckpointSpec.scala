package graft.text

import graft.SparkSpec

/** The r11 checkpoint knob: `graft.components.checkpointDir` switches
  * [[Dedup.connectedComponents]]' iterative rounds from executor-local
  * `localCheckpoint` blocks to RELIABLE `checkpoint` files (the
  * production-cluster path, where an executor loss must replay from
  * storage instead of failing a 20-round job). Both paths must produce
  * identical labels, and the reliable path must actually write round
  * snapshots to the configured directory.
  */
class ComponentsCheckpointSpec extends SparkSpec {

  private val confKey = "graft.components.checkpointDir"

  /** 3 chains of 40 nodes + isolated pairs: deep enough that pointer
    * doubling needs several rounds (label distance 39), so the reliable
    * path exercises multiple round checkpoints, not just the seed.
    */
  private def chainPairs = {
    import spark.implicits._
    val chains = for {
      c <- 0 until 3
      i <- 0 until 39
    } yield (c * 1000L + i + 1, c * 1000L + i) // descending-ish edge order
    val pairs = chains ++ Seq((9000L, 9001L), (9500L, 9501L))
    pairs.toDF("d1", "d2")
  }

  private def expectedLabels: Seq[(Long, Long)] =
    ((for (c <- 0 until 3; i <- 0 until 40) yield (c * 1000L + i, c * 1000L)) ++
      Seq((9000L, 9000L), (9001L, 9000L), (9500L, 9500L), (9501L, 9500L)))
      .sortBy(_._1)

  test("reliable-checkpoint path: identical labels AND snapshots in the configured dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(confKey, dir)
    try {
      // smallEdgeLimit=0 forces the iterative distributed path
      val got = Dedup.connectedComponents(chainPairs, smallEdgeLimit = 0L)
        .as[(Long, Long)].collect().toSeq
      assert(got === expectedLabels)
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0,
        s"expected reliable checkpoint snapshots under $dir, found none " +
          "(the knob silently fell back to localCheckpoint)")
    } finally {
      spark.conf.unset(confKey)
    }
  }

  test("gate queries are knob-neutral: components gates identical with the conf set") {
    // at gate scale the edge sets sit under smallEdgeLimit (driver-side
    // union-find — no checkpoints at all), so the knob must be a strict
    // no-op there; this pins that setting it in production config cannot
    // perturb gate output wherever each path engages
    import graft.SparkEntry
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-gates").toString
    for (name <- Seq("dd_components", "dd_sim_components", "dd_jac_components")) {
      val base = SparkEntry.queries(name)(spark, sf0001).collect().toSeq
      spark.conf.set(confKey, dir)
      try {
        val knobbed = SparkEntry.queries(name)(spark, sf0001).collect().toSeq
        assert(knobbed === base, s"$name output changed under $confKey")
      } finally spark.conf.unset(confKey)
    }
  }

  test("default (localCheckpoint) path unchanged and equal to the reliable path") {
    import spark.implicits._
    assert(spark.conf.getOption(confKey).isEmpty)
    val got = Dedup.connectedComponents(chainPairs, smallEdgeLimit = 0L)
      .as[(Long, Long)].collect().toSeq
    assert(got === expectedLabels)
  }
}
