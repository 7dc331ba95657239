package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage timing for dd_ppjoin (not part of the engine surface):
  * brackets which stage of jaccardPairsPrefixDf dominates its bench cost —
  * the ordering pass (exact-df vs the production CMS estimate), the prefix
  * candidate join, or the exact verify (timed in isolation against
  * materialized candidates) — with the inverted index as the density
  * baseline. This is the probe that caught the boxed-UDF verify kernel
  * (r10: full 3.8 s with ~2.5 s in verify; 1.6 s after
  * SortedLongIntersectCount).
  */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("ppjoin-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c = f
        ((System.nanoTime() - t0) / 1e9, c)
      }
      println(f"PROBE $label%-22s best=${ts.map(_._1).min}%6.2f s rows=${ts.head._2}")
    }

    val hashed = Dedup.hashedShingleDocs(
      graft.Tables.documents(spark, d), "doc_id", "text")
    val base = hashed.repartition(col("doc_id"))

    time("hashed_scan") { hashed.count() }
    time("dfOrdered_exact") { Dedup.dfOrdered(base).count() }
    time("cmsOrdered_prod") { Dedup.cmsOrdered(base, sketchFrom = hashed).count() }
    time("candidates_prod") {
      Dedup.prefixCandidates(
        Dedup.cmsOrdered(base, sketchFrom = hashed), 0.5).count()
    }
    // isolate verify: materialize the candidate pairs, then time only the
    // array joins + native merge kernel. Only meaningful when the candidate
    // set is small enough that the driver-local relation doesn't distort
    // the plan (a 500k-row parallelized local collection loses partition
    // stats and times the probe harness, not the verify stage).
    // guard BEFORE collecting: a limit(cap+1).count() costs one cheap job,
    // while collect-then-check would OOM the driver on the very corpus the
    // guard exists for
    val candFrame = Dedup.prefixCandidates(
      Dedup.cmsOrdered(base, sketchFrom = hashed), 0.5)
    val underCap = candFrame.limit(200001).count() <= 200000
    if (underCap) {
      import spark.implicits._
      val candDf = candFrame.collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.toDF("d1", "d2")
      time("verify_isolated") { Dedup.verifyCandidatesProbe(base, candDf, 0.5).count() }
    } else println("PROBE verify_isolated       skipped (> 200k candidates)")
    time("full_ppjoin") { Dedup.jaccardPairsPrefixDf(hashed, 0.5).count() }
    time("inverted_index") { Dedup.jaccardPairsHashed(hashed, 0.5).count() }
    spark.stop()
  }
}
