package org.apache.spark.serializer

/** Minimal `private[spark]` accessor bridge: exposes whether a serializer
  * supports relocation of serialized objects, which decides if Spark's
  * serialized (Tungsten) shuffle writer — which never retains
  * deserialized records — can be chosen for an RDD shuffle. Needed by
  * `graft.plans.IntervalStabJoinExec.mustCopyBeforeShuffle` to mirror
  * `ShuffleExchangeExec.needToCopyObjectsBeforeShuffle` for its custom
  * shuffle; nothing else belongs in this file.
  */
object GraftSerializerBridge {
  def supportsRelocation(s: Serializer): Boolean =
    s.supportsRelocationOfSerializedObjects

  /** Whether the ACTIVE shuffle manager is Spark's built-in sort-based one.
    * `ShuffleExchangeExec.needToCopyObjectsBeforeShuffle` copies
    * unconditionally when it is not (a pluggable manager — Celeborn,
    * Uniffle, … — may buffer deserialized records), and the stab join's
    * copy-elision must mirror that rule exactly (r16 ADVICE): both the
    * `ShuffleManager` trait and `SparkEnv.shuffleManager` are
    * `private[spark]`, hence this bridge.
    */
  def sortShuffleManagerActive: Boolean =
    org.apache.spark.SparkEnv.get.shuffleManager
      .isInstanceOf[org.apache.spark.shuffle.sort.SortShuffleManager]
}
