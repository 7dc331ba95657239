package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.ops.RangeJoin

/** The interval-stab strategy must produce exactly the rows of a
  * driver-side nested-loop reference (NOT a Spark cross join — Catalyst
  * would rewrite that back into an inner join this very strategy claims),
  * across random data, strict/inclusive bounds, point side, empty inputs,
  * and extra residual predicates — and must actually claim the plan.
  */
class IntervalStabJoinSpec extends SparkSpec with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    IntervalStabJoinStrategy.register(spark)
  }

  private def randomData(seed: Int, nPts: Int, nIvs: Int, span: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val pts = (0 until nPts).map(i => (i, rnd.nextInt(1000).toLong))
      .toDF("pt_id", "p")
    val ivs = (0 until nIvs).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i, s, s + rnd.nextInt(span))
    }.toDF("iv_id", "s", "e")
    (pts, ivs)
  }

  /** Driver-side nested-loop reference over the collected inputs. */
  private def reference(
      pts: DataFrame, ivs: DataFrame,
      loStrict: Boolean = false, hiStrict: Boolean = false): Seq[(Int, Int)] = {
    val ps = pts.collect().map(r => (r.getInt(0), r.getLong(1)))
    val is = ivs.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    (for {
      (pid, p) <- ps
      (iid, s, e) <- is
      if (if (loStrict) p > s else p >= s) && (if (hiStrict) p < e else p <= e)
    } yield (pid, iid)).sorted.toSeq
  }

  private def pairs(df: DataFrame): Seq[(Int, Int)] =
    df.select("pt_id", "iv_id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq

  /** Run `body` with broadcast forced off (shuffle-sweep variant) then
    * back on (broadcast variant picks up small sides again).
    */
  private def withoutBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }

  test("matches nested-loop reference on random data (both variants)") {
    // asymmetric sides: points ≫ intervals so stats select the broadcast
    // variant under the default conf; broadcast off forces the sweep
    val (pts, ivs) = randomData(1, 5000, 60, 20)
    val q = pts.join(ivs, col("p") >= col("s") && col("p") <= col("e"))
    val want = reference(pts, ivs)
    assert(want.nonEmpty)
    assert(pairs(q) == want)                      // broadcast variant
    withoutBroadcast { assert(pairs(q) == want) } // shuffle-sweep variant
  }

  test("the strategy claims the plan, picking the variant by stats") {
    val (pts, ivs) = randomData(2, 5000, 30, 10)
    def plan = pts.join(ivs, col("p") >= col("s") && col("p") <= col("e"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastIntervalStabJoin"), plan)
    withoutBroadcast {
      val p = plan
      assert(p.contains("IntervalStabJoin") && !p.contains("BroadcastIntervalStabJoin"), p)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // symmetric sides: the driver-serial broadcast build is NOT amortized —
    // the sweep must win even though the interval side fits the threshold
    val (pts2, ivs2) = randomData(3, 60, 50, 10)
    val p2 = pts2.join(ivs2, col("p") >= col("s") && col("p") <= col("e"))
      .queryExecution.executedPlan.toString
    assert(p2.contains("IntervalStabJoin") && !p2.contains("BroadcastIntervalStabJoin"), p2)
  }

  test("strict bounds and reversed operand order (both variants)") {
    val (pts, ivs) = randomData(3, 400, 200, 15)
    val q = pts.join(ivs, col("s") < col("p") && col("e") > col("p"))
    val want = reference(pts, ivs, loStrict = true, hiStrict = true)
    assert(want.nonEmpty)
    assert(pairs(q) == want)
    withoutBroadcast { assert(pairs(q) == want) }
  }

  test("points on the RIGHT side of the join") {
    val (pts, ivs) = randomData(4, 300, 200, 15)
    val got = pairs(ivs.join(pts, col("p") >= col("s") && col("p") <= col("e")))
    val want = reference(pts, ivs)
    assert(want.nonEmpty && got == want)
  }

  test("extra residual predicate rides along") {
    val (pts, ivs) = randomData(5, 300, 200, 15)
    val got = pairs(pts.join(ivs,
      col("p") >= col("s") && col("p") <= col("e") &&
        (col("pt_id") + col("iv_id")) % 3 === 0))
    val want = reference(pts, ivs).filter { case (a, b) => (a + b) % 3 == 0 }
    assert(want.nonEmpty && got == want)
  }

  test("nulls and empty sides produce no rows, not errors") {
    import spark.implicits._
    val pts = Seq((1, Some(5L)), (2, None), (3, Some(100L)))
      .toDF("pt_id", "p")
    val ivs = Seq((10, Some(1L), Some(6L)), (11, None, Some(9L)), (12, Some(2L), None))
      .toDF("iv_id", "s", "e")
    val got = pts.join(ivs, col("p") >= col("s") && col("p") <= col("e"))
      .select("pt_id", "iv_id").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.toSeq == Seq((1, 10)))
    val empty = pts.where(lit(false))
    assert(empty.join(ivs, col("p") >= col("s") && col("p") <= col("e")).count() == 0)
  }

  test("planned variant equals the bucketed RangeJoin on sf0.001 j1 shape") {
    val s = spark
    import s.implicits._
    val orders = s.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_orderkey".as("iv_start"),
        ($"o_orderkey" + 9L).as("iv_end"))
    val li = s.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    val planned = RangeJoin.pointInIntervalPlanned(li, "l_orderkey", orders,
        "iv_start", "iv_end")
      .groupBy("o_orderkey").count().orderBy("o_orderkey").collect()
    val bucketed = RangeJoin.pointInInterval(li, "l_orderkey", orders,
        "iv_start", "iv_end", 10L)
      .groupBy("o_orderkey").count().orderBy("o_orderkey").collect()
    assert(planned.nonEmpty && planned.toSeq == bucketed.toSeq)
  }

  test("property: random corpora match the nested-loop reference (both variants)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      seed <- Gen.choose(100, 100000)
      nPts <- Gen.choose(0, 120)
      nIvs <- Gen.choose(0, 80)
      span <- Gen.choose(1, 200)     // tiny through partition-crossing spans
      bcast <- Gen.oneOf(true, false)
    } yield (seed, nPts, nIvs, span, bcast)
    val prop = Prop.forAll(gen) { case (seed, nPts, nIvs, span, bcast) =>
      val (pts, ivs) = randomData(seed, nPts, nIvs, span)
      val q = pts.join(ivs, col("p") >= col("s") && col("p") <= col("e"))
      val want = reference(pts, ivs)
      val got = if (bcast) pairs(q) else withoutBroadcast(pairs(q))
      got == want
    }
    val res = check(Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  // (no test for nondeterministic conditions: Spark's analyzer rejects
  // them in join conditions outright — INVALID_NON_DETERMINISTIC_EXPRESSIONS
  // — so the strategy's `cond.deterministic` guard is unreachable through
  // the public API and exists as defense in depth)

  test("planted skew: a 90%-on-one-key corpus splits the hot key, results exact") {
    import spark.implicits._
    // 90% of 20k points sit on key 500; intervals cover it and its flanks
    val rnd = new scala.util.Random(41)
    val pts = (0 until 20000)
      .map(i => (i, if (i % 10 != 0) 500L else rnd.nextInt(1000).toLong))
      .toDF("pt_id", "p")
    val ivs = (0 until 300).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i, s, s + rnd.nextInt(30))
    }.toDF("iv_id", "s", "e")
    val q = pts.join(ivs, col("p") >= col("s") && col("p") <= col("e"))
    val want = reference(pts, ivs)
    assert(want.nonEmpty)
    withoutBroadcast { assert(pairs(q) == want) } // the sweep variant, split hot key
    assert(pairs(q) == want)                      // broadcast variant unaffected

    // partitioner-level balance: the hot key is detected from the one-pass
    // sample, gets >= 2 sub-partitions, and content-hash routing spreads
    // its points so no partition holds more than ~2 average shares
    val keys = spark.sparkContext.parallelize(
      pts.select("p").as[Long].collect().toSeq, 8)
    val part = SkewAwareRangePartitioner.fromKeys(keys, 32)
    assert(part.hotKeys.contains(500L), s"hot key undetected: ${part.hotKeys}")
    assert(part.hotKeys(500L)._2 >= 2, "hot key must split")
    assert(part.numPartitions > part.basePartitions)
    val counts = new Array[Long](part.numPartitions)
    val all = pts.select("p").as[Long].collect()
    all.zipWithIndex.foreach { case (k, i) =>
      counts(part.pointPartition(k, i * 0x9E3779B9)) += 1
    }
    val maxShare = counts.max.toDouble / all.length
    val hotSplit = part.hotKeys(500L)._2
    assert(maxShare <= math.max(2.0 / 32, 1.2 * 0.9 / hotSplit),
      s"straggler partition survived: max share $maxShare, split $hotSplit, " +
        s"counts ${counts.mkString(",")}")
    // intervals covering the hot key replicate to every sub-partition
    val cover = part.intervalCover(490L, 510L).toSet
    val (off, s) = part.hotKeys(500L)
    assert((0 until s).forall(i => cover.contains(part.basePartitions + off + i)))
    // a span NOT covering the hot key replicates to no sub-partition
    assert(part.intervalCover(501L, 520L).forall(_ < part.basePartitions))
    // monotonic base cover is contiguous
    val baseCover = part.intervalCover(100L, 300L).filter(_ < part.basePartitions).toSeq
    assert(baseCover == (baseCover.min to baseCover.max))
    // no skew -> no sub-partitions, pure range behavior
    val flat = SkewAwareRangePartitioner.fromKeys(
      spark.sparkContext.parallelize(0L until 20000L, 8), 32)
    assert(flat.hotKeys.isEmpty && flat.numPartitions == flat.basePartitions)
  }

  test("targetPartitions=1 still grows past the rows-per-partition cap") {
    // r15 ADVICE: the old n0==1 early return ran before the exact count,
    // so a session with shuffle.partitions=1 buffered the entire point
    // side in one task — the unbounded-buffer OOM the cap exists to
    // prevent. Growth must apply regardless of the requested count.
    val keys = spark.sparkContext.parallelize(0L until 50000L, 8)
    val grown = SkewAwareRangePartitioner.fromKeys(
      keys, 1, maxRowsPerPartition = 10000L)
    assert(grown.numPartitions >= 5,
      s"cap must grow a 1-partition request: got ${grown.numPartitions}")
    // under the cap a single requested partition stays single (the old
    // early-return behavior, now produced by the zero-bounds walk)
    val single = SkewAwareRangePartitioner.fromKeys(
      spark.sparkContext.parallelize(0L until 100L, 2), 1)
    assert(single.numPartitions == 1 && single.hotKeys.isEmpty)
  }

  test("partitioner is deterministic under recompute (task-retry safety)") {
    // r15 verdict ask #6: a retried map task re-evaluates the sample and
    // the routing; both must be pure functions of the data or a fetch
    // failure mid-join silently mis-partitions rows. Three layers:
    // the reservoir seed is fixed per partition index, the sketch fold is
    // sorted before bounds/hot-key assignment, and hot-key fan-out hashes
    // row content — so building twice from the same RDD is bit-identical,
    // and routing the same row twice lands identically.
    val rnd = new scala.util.Random(3)
    val skewed = spark.sparkContext.parallelize(
      Seq.fill(20000)(if (rnd.nextDouble() < 0.6) 42L else rnd.nextInt(5000).toLong), 8)
    val p1 = SkewAwareRangePartitioner.fromKeys(skewed, 32)
    val p2 = SkewAwareRangePartitioner.fromKeys(skewed, 32)
    assert(p1.hotKeys == p2.hotKeys, "hot-key table must rebuild identically")
    assert(p1.numPartitions == p2.numPartitions)
    assert((0L until 5000L).forall(k =>
      p1.pointPartition(k, k.hashCode) == p2.pointPartition(k, k.hashCode)),
      "point routing must be a pure function of (key, content hash)")
    assert((0L until 500L).forall(k =>
      p1.intervalCover(k, k + 50).toSeq == p2.intervalCover(k, k + 50).toSeq),
      "interval cover must be a pure function of the span")
  }

  test("map-side copy is skipped exactly when a stream-through writer applies") {
    // r15 verdict watch item: the per-row copy before the shuffle was
    // 25-40% of j1's sf10 wall in GC. It is safe to skip whenever the
    // writer serializes records on receipt: bypass (<= threshold) or the
    // serialized Kryo shuffle (relocation + <= 2^24 partitions). All the
    // differential tests in this suite run copy-free through the bypass
    // regime; this pins the decision table itself.
    val conf = new org.apache.spark.SparkConf()
    assert(!IntervalStabJoinExec.mustCopyBeforeShuffle(conf, 32, true))
    assert(!IntervalStabJoinExec.mustCopyBeforeShuffle(conf, 200, true))
    // above bypass: default Kryo relocates -> serialized writer -> no copy
    assert(!IntervalStabJoinExec.mustCopyBeforeShuffle(conf, 201, true))
    assert(!IntervalStabJoinExec.mustCopyBeforeShuffle(conf, 16384, true))
    // past the serialized-mode partition limit nothing streams -> copy
    assert(IntervalStabJoinExec.mustCopyBeforeShuffle(conf, (1 << 24) + 1, true))
    // a conf that shrinks the bypass threshold moves the boundary
    val tight = new org.apache.spark.SparkConf()
      .set("spark.shuffle.sort.bypassMergeThreshold", "1")
    assert(!IntervalStabJoinExec.mustCopyBeforeShuffle(tight, 1, true))
    assert(!IntervalStabJoinExec.mustCopyBeforeShuffle(tight, 2, true),
      "Kryo relocation keeps the serialized writer available above bypass")
    // r16 ADVICE: a pluggable (non-sort-based) shuffle manager may buffer
    // deserialized records, so EVERY regime must copy there — including
    // the partition counts that would stream through under the built-in
    // manager.
    assert(IntervalStabJoinExec.mustCopyBeforeShuffle(conf, 32, false))
    assert(IntervalStabJoinExec.mustCopyBeforeShuffle(conf, 201, false))
    assert(IntervalStabJoinExec.mustCopyBeforeShuffle(tight, 1, false))
    // and the live session (built-in manager) must report sort-based
    assert(org.apache.spark.serializer.GraftSerializerBridge
      .sortShuffleManagerActive,
      "local[*] sessions run Spark's built-in SortShuffleManager")
  }

  test("sweep buffer byte budget fails LOUD on wide rows (rows cap can't see width)") {
    // r17 ADVICE sweep: maxRowsPerPartition bounds COUNT; a payload
    // column riding through the join multiplies resident bytes without
    // moving the row count. The byte budget converts that silent
    // executor OOM into a named failure during buffering.
    import spark.implicits._
    val pts = (0 until 200).map(i =>
      (i, (i % 50).toLong, "x" * 4096)).toDF("pt_id", "p", "payload")
    val ivs = (0 until 20).map(i =>
      (i, (i * 2).toLong, (i * 2 + 10).toLong)).toDF("iv_id", "s", "e")
    def run(): Long = withoutBroadcast {
      // sum over the payload AFTER the join: column pruning must NOT drop
      // the wide column (a count() would), or the buffered rows are slim
      // and the budget never binds
      pts.join(ivs, col("p") >= col("s") && col("p") <= col("e"))
        .agg(sum(length(col("payload")))).collect()(0).getLong(0)
    }
    val key = "spark.graft.stabJoin.maxBytesPerPartition"
    spark.conf.set(key, "8192") // ~2 wide rows
    try {
      val e = intercept[org.apache.spark.SparkException](run())
      assert(e.getMessage.contains("maxBytesPerPartition") ||
        Option(e.getCause).exists(_.getMessage.contains("maxBytesPerPartition")),
        s"expected the byte-budget failure, got: ${e.getMessage}")
    } finally spark.conf.unset(key)
    assert(run() > 0, "default budget must pass the same join")
  }

  test("copy rule tracks Spark's own needToCopyObjectsBeforeShuffle (drift tripwire)") {
    // r17 ADVICE sweep: mustCopyBeforeShuffle mirrors an INTERNAL Spark
    // contract (ShuffleExchangeExec.needToCopyObjectsBeforeShuffle) that
    // a Spark upgrade can silently change — and a drifted copy rule
    // corrupts join output, it doesn't crash. Cross-check our rule
    // against the real method via reflection in the LIVE session (same
    // SparkEnv, same conf) across the regime boundaries. If the method
    // moves or its signature changes, this fails with NoSuchMethod —
    // the loud signal to re-verify the mirrored table.
    val seeObj = Class.forName(
      "org.apache.spark.sql.execution.exchange.ShuffleExchangeExec$")
    val module = seeObj.getField("MODULE$").get(null)
    val meth = seeObj.getDeclaredMethod("needToCopyObjectsBeforeShuffle",
      classOf[org.apache.spark.Partitioner])
    meth.setAccessible(true)
    def sparkRule(n: Int): Boolean =
      meth.invoke(module, new org.apache.spark.HashPartitioner(n))
        .asInstanceOf[Boolean]
    val liveConf = spark.sparkContext.getConf
    val sortBased = org.apache.spark.serializer.GraftSerializerBridge
      .sortShuffleManagerActive
    for (n <- Seq(1, 32, 200, 201, 16384, 1 << 24, (1 << 24) + 1))
      assert(
        IntervalStabJoinExec.mustCopyBeforeShuffle(liveConf, n, sortBased) ==
          sparkRule(n),
        s"copy rule drifted from Spark's at numParts=$n")
  }

  test("equi-join predicates are left to Catalyst") {
    val (pts, ivs) = randomData(6, 50, 30, 10)
    val plan = pts.join(ivs,
        col("pt_id") === col("iv_id") && col("p") >= col("s") && col("p") <= col("e"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("IntervalStabJoin"), plan)
  }
}
