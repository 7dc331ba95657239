package org.apache.spark

/** Minimal `private[spark]` accessor bridge: total events dropped by the
  * async listener bus across all queues. Needed by `graft.Bench` to mark
  * its task-metric aggregates (spill/peak) as undercounts when the bus
  * sheds events under load — the r15/r16 suspect for a graded run
  * reporting spill_mb = 0 where an in-round run of the same code measured
  * 34 GB. Counter names follow AsyncEventQueue's registration
  * (`queue.<name>.numDroppedEvents`); nothing else belongs in this file.
  */
object GraftListenerBridge {
  def droppedEvents(sc: SparkContext): Long = {
    import scala.jdk.CollectionConverters._
    sc.listenerBus.metrics.metricRegistry.getCounters.asScala.collect {
      case (name, c) if name.endsWith("numDroppedEvents") => c.getCount
    }.sum
  }

  /** Registered counter names of the live bus — the name-drift tripwire's
    * surface (GraftListenerBridgeSpec): if a Spark upgrade renames
    * `numDroppedEvents`, [[droppedEvents]] would silently return 0
    * forever and every spill row would read as trustworthy.
    */
  def registeredCounterNames(sc: SparkContext): Seq[String] = {
    import scala.jdk.CollectionConverters._
    sc.listenerBus.metrics.metricRegistry.getCounters.asScala.keys.toSeq
  }
}
