package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
import org.apache.spark.util.sketch.BloomFilter

import graft.SparkSpec

/** Native broadcast-Bloom membership probe (`cur_decontaminate_bloom`'s
  * prefilter): no false negatives for inserted keys, bounded false
  * positives, codegen plan, and the composed query pinned equal to the
  * exact broadcast-semi-join decontamination.
  */
class BloomExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private def probe(keys: Seq[Long], filter: BloomFilter) = {
    val bc = spark.sparkContext.broadcast(filter)
    keys.toDF("k")
      .select(col("k"), colOf(BloomMightContainLong(expression(col("k")), bc)).as("hit"))
      .as[(Long, Boolean)].collect().toMap
  }

  test("no false negatives: every inserted key probes true") {
    val inserted = (0L until 5000L).map(i => i * 2654435761L % 1000000007L)
    val f = BloomFilter.create(8192, 0.01)
    inserted.foreach(f.putLong)
    val hits = probe(inserted, f)
    assert(hits.values.forall(identity), "a bloom filter can never miss an inserted key")
  }

  test("false-positive rate stays near the configured fpp") {
    val f = BloomFilter.create(8192, 0.01)
    (0L until 8192L).foreach(f.putLong)
    // disjoint probe domain
    val fresh = (1000000L until 1010000L).toSeq
    val fp = probe(fresh, f).values.count(identity)
    assert(fp < fresh.size * 0.05, s"fp rate ${fp.toDouble / fresh.size} too high for fpp=0.01")
    assert(fp > 0, "a zero-FP run on 10k probes at fpp=0.01 suggests the probe is broken")
  }

  test("null propagates; codegen plan carries the native probe, no ScalaUDF") {
    val f = BloomFilter.create(64, 0.01)
    f.putLong(7L)
    val bc = spark.sparkContext.broadcast(f)
    val df = Seq(Some(7L), None, Some(8L)).toDF("k")
      .select(colOf(BloomMightContainLong(expression(col("k")), bc)).as("hit"))
    assert(df.as[Option[Boolean]].collect().toSeq === Seq(Some(true), None, Some(false)))
    // a local Seq folds to LocalTableScan, so assert the plan on a Range
    // source (the codegen path the corpus queries actually run)
    val ranged = spark.range(16)
      .select(colOf(BloomMightContainLong(expression(col("id")), bc)).as("hit"))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain_long_native"))
    assert(!plan.contains("ScalaUDF"))
    assert(ranged.where(col("hit")).count() === 1) // only id=7 was inserted
  }

  test("cur_decontaminate_bloom == cur_decontaminate (FPs die in the exact verify)") {
    val exact = graft.SparkEntry.queries("cur_decontaminate")(spark, sf001)
    val bloom = graft.SparkEntry.queries("cur_decontaminate_bloom")(spark, sf001)
    assert(bloom.exceptAll(exact).count() === 0)
    assert(exact.exceptAll(bloom).count() === 0)
  }

  test("cur_decontaminate_bloom runs broadcast-free: the scale claim, behaviorally") {
    // at the scale where the bloom path matters, NOTHING on the verify
    // side fits a broadcast-hash relation — so the query must produce the
    // same rows with auto-broadcast disabled entirely (falls to shuffled
    // joins), not merely when the optimizer happens to broadcast the
    // small sides of the toy corpus
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val noBroadcast = graft.SparkEntry.queries("cur_decontaminate_bloom")(spark, sf001)
        .collect().map(_.toString).sorted
      spark.conf.set(key, prev)
      val normal = graft.SparkEntry.queries("cur_decontaminate_bloom")(spark, sf001)
        .collect().map(_.toString).sorted
      assert(noBroadcast.toSeq === normal.toSeq)
    } finally spark.conf.set(key, prev)
  }

  test("the bloom prefilter actually prunes: candidate rows << exploded corpus rows") {
    val docs = graft.Tables.documents(spark, sf001)
    val hashed = graft.text.Dedup.hashedShingleDocs(docs, "doc_id", "text")
    val corpus = hashed.where(col("doc_id") >= 20)
      .select(col("doc_id"), explode(col("hs")).as("sh"))
    val bench = hashed.where(col("doc_id") < 20)
      .select(explode(col("hs")).as("sh")).distinct()
    val f = bench.stat.bloomFilter("sh", 1 << 17, 0.01)
    val bc = spark.sparkContext.broadcast(f)
    val total = corpus.count()
    val kept = corpus
      .where(colOf(BloomMightContainLong(expression(col("sh")), bc))).count()
    // at fpp=0.01 the survivor set is true-positives + ~1% of the rest;
    // the synthetic corpus shares few bench shingles, so well under half
    // the exploded rows may survive — this is the scan-stage pruning the
    // scale path exists for
    assert(kept < total / 2, s"bloom prefilter kept $kept of $total rows")
  }
}
