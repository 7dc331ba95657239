package graft

/** r17 ADVICE sweep over the r16 instruments: `GraftListenerBridge`
  * underwrites every "spill_mb is trustworthy iff drops=0" claim in the
  * bench artifacts, so its failure mode must not be silence.
  */
class GraftListenerBridgeSpec extends SparkSpec {

  test("the bus registers numDroppedEvents counters the bridge can see " +
    "(name-drift tripwire)") {
    // The bridge sums `queue.<name>.numDroppedEvents` counters over the
    // LIVE bus's metric registry — ALL queues, including the shared queue
    // user listeners (the bench's task-metrics aggregator) ride on. If a
    // Spark upgrade renames the counter, the bridge returns 0 forever and
    // every spill row silently reads as trustworthy; this spec fails
    // instead. In-process enumeration mirrors the bridge's own pattern.
    val names = org.apache.spark.GraftListenerBridge
      .registeredCounterNames(spark.sparkContext)
    val dropCounters = names.filter(_.endsWith("numDroppedEvents"))
    assert(dropCounters.nonEmpty,
      s"no numDroppedEvents counters in the bus registry — the bridge's " +
        s"name pattern drifted; registered counters: $names")
    // the shared queue (where addSparkListener listeners live — the
    // bench's spill/peak aggregates ride it) must be among them
    assert(dropCounters.exists(_.contains("shared")),
      s"no shared-queue drop counter: $dropCounters")
    // and the bridge itself must read a sane (non-negative) total
    val total = org.apache.spark.GraftListenerBridge
      .droppedEvents(spark.sparkContext)
    assert(total >= 0L)
  }
}
