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
}
