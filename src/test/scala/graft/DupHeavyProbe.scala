package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.Dedup

/** Duplicate-heavy regime probe (round-10 evidence run, not a test):
  * measures [[Dedup.jaccardComponents]] (digest-collapsed — exact-dup
  * classes become one representative + star edges BEFORE pair
  * generation) against the plain pair-graph path
  * `connectedComponents(jaccardPairsHashed(...))` on a corpus where the
  * pair relation blows up: 100 identical classes of 400 docs each →
  * 100·C(400,2) ≈ 8.0M j=1.0 pairs that carry zero connectivity
  * information beyond a 399-edge star. The uniform sf1 envelope run
  * showed parity (no dup classes to collapse); this is the other
  * bracket of the regime, analogous to dd_ppjoin's density bracketing.
  *
  * Also cross-checks that both paths emit the IDENTICAL (doc_id,
  * component) relation on this corpus before timing is trusted.
  *
  * Run: SPARK_GRAFT_DUP_DIR=/tmp/sf1dup sbt -batch \
  *        "Test/runMain graft.DupHeavyProbe"
  */
object DupHeavyProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_DUP_DIR", "/tmp/sf1dup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var peak = 0L
    @volatile var spill = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          peak = math.max(peak, m.peakExecutionMemory)
          spill += m.memoryBytesSpilled + m.diskBytesSpilled
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val hashed = Dedup.hashedShingleDocs(docs, "doc_id", "text")
    hashed.persist()
    println(s"corpus: ${hashed.count()} docs, " +
      s"${docs.select("text").distinct().count()} distinct texts")

    def timed(name: String)(body: => org.apache.spark.sql.DataFrame): Long = {
      peak = 0L; spill = 0L
      val t0 = System.nanoTime()
      val rows = body.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain (see EnvelopeProbe)
      println(f"$name%-22s $sec%8.2f s  rows=$rows%10d  " +
        f"peakTaskMB=${peak / 1048576}%5d  spillMB=${spill / 1048576}%6d")
      rows
    }

    // context: how big is the pair relation the collapsed path never builds?
    timed("pair relation")(Dedup.jaccardPairsHashed(hashed, 0.5))
    timed("pairs->components")(
      Dedup.connectedComponents(
        Dedup.jaccardPairsHashed(hashed, 0.5).select("d1", "d2")))
    timed("jaccardComponents")(Dedup.jaccardComponents(hashed, 0.5))

    // r12: the candidate-volume crossover table on the DUP-HEAVY bracket
    // (EnvelopeProbe measures the uniform bracket). On 100×400 identical
    // classes the exact tiers must pay the C(400,2)-per-class pair
    // blowup, while MinHash banding pays it too (identical docs share
    // every band) — the number that proves the routing rule's real win
    // here is the DIGEST-COLLAPSED path (jaccardComponents) below, which
    // never generates the within-class quadratic at all.
    {
      val shingled = Dedup.shingleDocs(docs, "doc_id", "text")
      // tripwires for the seeded generator corpus (every path is
      // deterministic — a moved count is a filter/banding regression)
      val isSeededCorpus = hashed.count() == 50000
      def stats(name: String, expect: Long)(f: => (Long, Long)): Unit = {
        val t0 = System.nanoTime()
        val (c, s) = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"cands $name%-22s cands=$c%10d survive=$s%10d " +
          f"rate=${if (c == 0) 0.0 else s.toDouble / c}%6.4f $sec%7.2f s")
        require(!isSeededCorpus || c == expect,
          s"TRIPWIRE: $name candidates $c != pinned $expect on sf1dup")
        require(!isSeededCorpus || s == 7980000L,
          s"TRIPWIRE: $name survivors $s != 7980000 on sf1dup")
      }
      stats("exact_inverted_index", 87346740L)(
        Dedup.jaccardCandidateStats(hashed, 0.5))
      stats("exact_ppjoin_prefix", 8448833L)(
        Dedup.ppjoinCandidateStats(hashed, 0.5))
      stats("sketch_minhash_lsh", 8015226L)(
        Dedup.minhashCandidateStats(shingled, 0.5))
    }

    // equivalence on THIS corpus (both directions of except)
    val a = Dedup.connectedComponents(
      Dedup.jaccardPairsHashed(hashed, 0.5).select("d1", "d2"))
    val b = Dedup.jaccardComponents(hashed, 0.5)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"equivalence: exceptAll diff rows = $diff " +
      (if (diff == 0) "(IDENTICAL)" else "(MISMATCH!)"))
    spark.stop()
    if (diff != 0) sys.exit(1)
  }
}
