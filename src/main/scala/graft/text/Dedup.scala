package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for the training-data pipeline:
  *
  *   - exact:       hash groupBy (see `j7_dedup_exact` in RelationalQueries)
  *   - n-gram Jaccard: EXACT near-dup pairs via an inverted shingle index —
  *     a pair join on shared shingles replaces the O(n²) compare; this is
  *     the scalable exact algorithm (any pair with J>0 shares a shingle);
  *     the df-ordered PPJoin variant ([[jaccardPairsPrefixDf]]) is the
  *     boilerplate-regime path (keeps corpus-common shingles out of every
  *     prefix — measured 2× faster with zero spill on a dense 10× corpus
  *     where the inverted index spills 18 GB)
  *   - MinHash+LSH: signature → banded buckets → candidate pairs →
  *     exact-Jaccard verification; sub-quadratic candidate generation for
  *     corpora where even the inverted index is too hot
  *   - SimHash: 60-bit locality-sensitive bit signature per document,
  *     with pigeonhole-banded near-dup pairs ([[simhashPairs]])
  *   - clustering WITHOUT the quadratic pair relation:
  *     [[simhashComponents]] / [[jaccardComponents]] — duplicate-class
  *     structure (identical sigs / identical shingle sets) collapses to
  *     representatives + star edges before anything pairwise runs, so
  *     components input stays linear in the corpus
  *
  * All hashing is the deterministic polynomial hash ([[TextOps.polyHash]])
  * so results are reproducible across engines and runs (no Spark
  * `hash()` in any VALUE that must match an oracle — engine-private
  * hashes appear only where they steer partitioning/digests, never
  * output values).
  *
  * Scale: the inverted-index join shuffles (shingle, docId) pairs —
  * partitioned by shingle; MinHash replaces the shingle shuffle with an
  * H-integer signature shuffle (H≈32), the classic 100-TB dedup shape
  * (shingle→minhash→band→bucket-join). Every banded/posting group
  * emitter in this file is memory-bounded by the r10 machinery: sampled
  * hot-key detection ([[hotKeys]]) + triangle block-grid salting
  * ([[gridTagged]]) + lazy pair iterators + an in-task `require` that
  * fails loud at 4×cap instead of OOMing an executor — all exchanges
  * carry fixed-width rows (plan-audited in PlanAuditSpec).
  */
object Dedup {

  import TextOps.HashPrime

  /** shingle sets per doc: (id, shingles array<string>) — the native
    * codegen expression [[graft.functions.ShingleStrings]] (r11): tokenize
    * + k-shingle + distinct in one fused pass, first-appearance order,
    * no per-shingle catalyst→Scala converter (same output as the
    * Column-expression [[TextOps.wordShingles]] chain, which measured
    * ~10× slower through interpreted higher-order functions).
    */
  def shingleDocs(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
    docs.select(
      col(idCol).as("doc_id"),
      colOf(graft.functions.ShingleStrings(expression(col(textCol)), k)).as("shingles"))
  }

  /** The same 60-bit hash over an already-shingled string array (the
    * [[shingleDocs]] output) — compatibility entry for callers that hold
    * shingle strings; [[hashedShingleDocs]] is the fast path. Native
    * codegen ([[graft.functions.HashShingleArray]], r11).
    */
  private def hashShingleArray(shingles: Column): Column = {
    import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
    colOf(graft.functions.HashShingleArray(expression(shingles)))
  }

  /** (doc_id, hs sorted distinct shingle hashes, n = |hs|) from raw text —
    * the native fused expression [[graft.functions.HashedShingles]] (r11):
    * one sweep over the text, no shingle string ever allocated, no
    * converter pass on the output longs (the string-array [[shingleDocs]]
    * + rehash path measured 3× slower even as a UDF).
    */
  def hashedShingleDocs(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
    docs.select(col(idCol).as("doc_id"),
        colOf(graft.functions.HashedShingles(expression(col(textCol)), k)).as("hs"))
      .select(col("doc_id"), col("hs"), size(col("hs")).as("n"))
  }

  /** Default per-task group-membership cap for the banded/posting pair
    * generators: a grid cell or posting group larger than this is split by
    * [[gridTagged]] salting, so no task's buffered member array exceeds
    * ~4× this count (≈ a few tens of MB of heap) regardless of corpus
    * skew. The working bound is ENFORCED by a `require` inside every
    * group emitter — a sampling miss fails loud instead of OOMing an
    * executor.
    */
  private[text] val DefaultGroupCap: Int = 1 << 18

  /** Default id-hash sampling modulus for [[hotKeys]] (1/64 ≈ 1.6% of
    * docs). A group at the cap (2^18 docs) appears ~4096 times in the
    * sample vs a flag threshold of 2048 — the Chernoff miss probability
    * is e^(−512)-scale, i.e. a genuinely hot key is never missed; keys
    * flagged spuriously just get salted unnecessarily, which cannot
    * affect output (hotness steers PARTITIONING only).
    */
  private[text] val DefaultSampleMod: Int = 64

  /** Estimated hot keys — (keyCol, blocks) for every group whose
    * membership exceeds ~cap/2 — from a DETERMINISTIC id-hash sample
    * (`xxhash64(docCol) % sampleMod == 0`, so the estimate is stable
    * across partition layouts and the predicate pushes below any
    * shingle/signature UDF in `rows`' lineage: the sampled pass computes
    * signatures for 1/sampleMod of the docs, not all of them).
    * `sampleMod <= 1` counts exactly (used by spec fixtures and by
    * sig-level callers whose input is already small).
    *
    * blocks = ceil(estimated count / cap), min 2 — the grid arm count
    * for [[gridTagged]].
    */
  private[text] def hotKeys(
      rows: DataFrame, keyCol: String, docCol: String,
      cap: Int, sampleMod: Int): DataFrame = {
    val sampled =
      if (sampleMod <= 1) rows
      else rows.where(pmod(xxhash64(col(docCol)), lit(sampleMod.toLong)) === 0)
    val thresh =
      if (sampleMod <= 1) cap.toLong
      else math.max(1L, cap.toLong / (2L * sampleMod))
    sampled.groupBy(keyCol).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > thresh)
      .select(col(keyCol),
        greatest(lit(2L),
          ceil(col("cnt") * lit(sampleMod.toLong) / lit(cap.toDouble)))
          .cast("int").as("blocks"))
  }

  /** Triangle block-grid salting of hot groups (same shape as the cosine
    * near-dup block grid, `ann/Ann.scala`): a member of a hot key is
    * assigned block `b = xxhash64(blockBy) % blocks` and replicated to the
    * `blocks` grid cells `(min(b,k), max(b,k))`; a DIAGONAL cell (ci==cj)
    * pairs within its single block, an OFF-DIAGONAL cell pairs strictly
    * ACROSS its two blocks — every unordered member pair meets in exactly
    * one cell, each task holds at most ~2 blocks ≈ 2·cap members, and the
    * quadratic pair work of a hot key spreads over blocks·(blocks+1)/2
    * tasks instead of one straggler. Non-hot keys (the overwhelming
    * majority) take `blocks = 1`: a single diagonal cell, one copy, same
    * single-shuffle cost as the unsalted form, since `hot` is a
    * broadcast join (its size is bounded by Σc/(cap/2) entries — tiny
    * whenever the job is feasible at all).
    *
    * Adds (gblk, gci, gcj) to `rows`; the caller groups by
    * (keyCol, gci, gcj) and splits members by gblk.
    */
  private[text] def gridTagged(
      rows: DataFrame, keyCol: String, blockBy: String, hot: DataFrame): DataFrame =
    rows.join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("gb", coalesce(col("blocks"), lit(1)))
      .withColumn("gblk", pmod(xxhash64(col(blockBy)), col("gb").cast("long")).cast("int"))
      .withColumn("gk", explode(sequence(lit(0), col("gb") - lit(1))))
      .withColumn("gci", least(col("gblk"), col("gk")).cast("int"))
      .withColumn("gcj", greatest(col("gblk"), col("gk")).cast("int"))
      .drop("blocks", "gb", "gk")

  /** The executable form of the per-task memory bound: group emitters call
    * this before buffering; a membership beyond the salted-grid working
    * bound (sampling missed a hot key — Chernoff-improbable, see
    * [[DefaultSampleMod]]) fails loud instead of OOMing an executor.
    */
  private def requireBounded(m: Int, cap: Int): Unit =
    require(m <= 4L * cap + 1024,
      s"pair-group membership $m exceeds the salted working bound (cap=$cap); " +
        "lower sampleMod (more sampling) or cap — a hot key escaped detection")

  /** Lazy cross-block pair emitter for (doc, n, isNew) members: pairs each
    * element of `a` with each of `b` (never within a side — diagonal cells
    * own those), canonically oriented d1 < d2, skipping old×old pairs IN
    * PLACE (nothing is generated then filtered, and nothing quadratic is
    * ever buffered).
    */
  private[text] def crossPairs(
      a: Array[(Long, Long, Boolean)],
      b: Array[(Long, Long, Boolean)]): Iterator[(Long, Long, Long, Long)] =
    if (a.isEmpty || b.isEmpty) Iterator.empty
    else new Iterator[(Long, Long, Long, Long)] {
      private var i = 0
      private var j = 0
      private def ok: Boolean = a(i)._3 || b(j)._3
      private def step(): Unit = { j += 1; if (j >= b.length) { j = 0; i += 1 } }
      private def advance(): Unit = while (i < a.length && !ok) step()
      advance()
      def hasNext: Boolean = i < a.length
      def next(): (Long, Long, Long, Long) = {
        val (da, na, _) = a(i)
        val (db, nb, _) = b(j)
        val p = if (da < db) (da, na, db, nb) else (db, nb, da, na)
        step(); advance()
        p
      }
    }

  /** Lazy i<j pair walk over sorted ids — nothing quadratic materializes
    * in the task; downstream exchanges consume pairs as they stream out.
    */
  private[text] def idPairsWithin(ids: Array[Long]): Iterator[(Long, Long)] =
    new Iterator[(Long, Long)] {
      private var i = 0
      private var j = 1
      def hasNext: Boolean = i < ids.length - 1
      def next(): (Long, Long) = {
        val p = (ids(i), ids(j))
        j += 1
        if (j >= ids.length) { i += 1; j = i + 1 }
        p
      }
    }

  /** Lazy cross-block id-pair emitter (off-diagonal grid cells): each a×b
    * pair once, canonically oriented (min, max), nothing buffered.
    */
  private[text] def idPairsAcross(a: Array[Long], b: Array[Long]): Iterator[(Long, Long)] =
    if (a.isEmpty || b.isEmpty) Iterator.empty
    else new Iterator[(Long, Long)] {
      private var i = 0
      private var j = 0
      def hasNext: Boolean = i < a.length
      def next(): (Long, Long) = {
        val x = a(i); val y = b(j)
        j += 1
        if (j >= b.length) { j = 0; i += 1 }
        (math.min(x, y), math.max(x, y))
      }
    }

  /** Lazy qualifying-hamming pair walk over one block's distinct
    * signatures: every i<j pair with 1 <= popcount(xor) <= maxH, emitted
    * (min sig, max sig, hd) with non-qualifying pairs skipped IN PLACE.
    */
  private[text] def hammingPairsWithin(
      s: Array[Long], maxH: Int): Iterator[(Long, Long, Int)] =
    new Iterator[(Long, Long, Int)] {
      private var i = 0
      private var j = 1
      private def ok: Boolean = java.lang.Long.bitCount(s(i) ^ s(j)) <= maxH
      private def step(): Unit = { j += 1; if (j >= s.length) { i += 1; j = i + 1 } }
      private def advance(): Unit = while (i < s.length - 1 && !ok) step()
      advance()
      def hasNext: Boolean = i < s.length - 1
      def next(): (Long, Long, Int) = {
        val hd = java.lang.Long.bitCount(s(i) ^ s(j))
        val p = (math.min(s(i), s(j)), math.max(s(i), s(j)), hd)
        step(); advance()
        p
      }
    }

  /** [[hammingPairsWithin]] across two blocks of an off-diagonal grid
    * cell — pairs strictly between `a` and `b`.
    */
  private[text] def hammingPairsAcross(
      a: Array[Long], b: Array[Long], maxH: Int): Iterator[(Long, Long, Int)] =
    if (a.isEmpty || b.isEmpty) Iterator.empty
    else new Iterator[(Long, Long, Int)] {
      private var i = 0
      private var j = 0
      private def ok: Boolean = java.lang.Long.bitCount(a(i) ^ b(j)) <= maxH
      private def step(): Unit = { j += 1; if (j >= b.length) { j = 0; i += 1 } }
      private def advance(): Unit = while (i < a.length && !ok) step()
      advance()
      def hasNext: Boolean = i < a.length
      def next(): (Long, Long, Int) = {
        val hd = java.lang.Long.bitCount(a(i) ^ b(j))
        val p = (math.min(a(i), b(j)), math.max(a(i), b(j)), hd)
        step(); advance()
        p
      }
    }

  /** Shared posting-list pair counting behind [[jaccardPairsHashed]] and
    * [[jaccardPairsIncremental]]: explode postings, salt hot shingles
    * ([[hotKeys]] + [[gridTagged]]), emit per-cell pairs lazily, count
    * (d1, d2) co-occurrences map-side-combined. `isNew = None` treats
    * every doc as new (all pairs emitted).
    */
  private[text] def jaccardPairRows(
      hashed: DataFrame, isNew: Option[Column],
      cap: Int, sampleMod: Int,
      sizeDimCap: Int = SizeDimBroadcastCap): DataFrame = {
    val spark = hashed.sparkSession
    import spark.implicits._
    val postings = hashed.select(
      col("doc_id"), col("n").cast("long").as("n"),
      isNew.map(_.cast("boolean")).getOrElse(lit(true)).as("is_new"),
      explode(col("hs")).as("s"))
    val tagged = gridTagged(postings, "s", "doc_id",
      hotKeys(postings, "s", "doc_id", cap, sampleMod))
    val capL = cap
    val emitted = tagged
      .select(col("s"), col("gci"), col("gcj"), col("gblk"),
        col("doc_id"), col("n"), col("is_new"))
      .as[(Long, Int, Int, Int, Long, Long, Boolean)]
      .groupByKey(t => (t._1, t._2, t._3))
      .flatMapGroups { (key, it) =>
        val (_, ci, cj) = key
        if (ci == cj) {
          val members = it.map(t => (t._5, t._6, t._7)).toArray
          requireBounded(members.length, capL)
          java.util.Arrays.sort(members,
            Ordering.by[(Long, Long, Boolean), Long](_._1))
          incrementalPairs(members)
        } else {
          val aB = Array.newBuilder[(Long, Long, Boolean)]
          val bB = Array.newBuilder[(Long, Long, Boolean)]
          var m = 0
          it.foreach { t =>
            if (t._4 == ci) aB += ((t._5, t._6, t._7)) else bB += ((t._5, t._6, t._7))
            m += 1
          }
          requireBounded(m, capL)
          crossPairs(aB.result(), bB.result())
        }
      }
      .toDF("d1", "n1", "d2", "n2")
    // SLIM regime (r16): the candidate exchange+aggregate carries BARE
    // (d1, d2) — per-doc sizes are functional on the id, so shipping
    // n1/n2 through the Σc² candidate stream doubled its row width for
    // no information (at sf1 that aggregate spills ~34 GB/run; slimming
    // cut it to ~28.5). Sizes re-attach AFTER the count via two
    // broadcast joins against the doc-count-sized dim. A broadcast dim
    // only works while the CORPUS is broadcastable, so the regime is
    // gated on a capped early-exit count (never a full scan past the
    // cap): past `sizeDimBroadcastCap` docs the WIDE
    // regime ships n1/n2 inline with each pair — a wider exchange, but
    // zero driver/executor dim residency at any corpus size (a 20B-doc
    // corpus must never be collected as a broadcast table). Same router
    // idiom as the dedup exact/routed cutover; the two regimes are
    // output-identical (spec-asserted).
    //
    // The dim is collected ONCE and rebuilt as a LocalRelation (r16
    // ADVICE + verdict ask #3): the old shape ran the size-bearing
    // lineage once per broadcast dim (their differing aliases defeat
    // ReuseExchange), each build its own job launch — the measured
    // ~0.1–0.2 s sf0.1 exact-family floor regression. BroadcastExchange
    // over a LocalTableScan builds its hash relation from the driver
    // rows with ZERO jobs, and the driver residency is the SAME rows
    // BroadcastExchange's executeCollect would have pulled anyway —
    // once, instead of twice. Two deliberate shapes here, both
    // A/B-measured at sf0.1 (r17): the GATE keeps the doc_id-only
    // limit+count (column pruning drops the shingle computation from
    // its scan — `n` would force it — so it stays cheap at any corpus
    // size), and the collect is UNLIMITED — `limit(cap).collect()`
    // plans as CollectLimit/executeTake, whose sequential 1→4→16…
    // partition ramp recomputes the shingle lineage near-serially
    // (~0.3 s slower), and a fused RDD probe (per-partition counts +
    // budget-bounded rows in one job) re-plans the lineage through a
    // non-codegen DeserializeToObject pass (~0.2–0.35 s slower). The
    // gate passing bounds the unlimited collect at `sizeDimCap` rows by
    // construction.
    val slim = hashed.select("doc_id")
      .limit(sizeDimCap + 1).count() <= sizeDimCap
    if (slim) {
      val sizeRows = hashed
        .select(col("doc_id"), col("n").cast("long").as("n"))
        .as[(Long, Long)].collect()
      val counted = emitted.select("d1", "d2")
        .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      val sizes = spark.createDataset(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(sizeRows))
        .toDF("doc_id", "n")
      counted
        .join(broadcast(sizes.select(col("doc_id").as("d1"), col("n").as("n1"))), "d1")
        .join(broadcast(sizes.select(col("doc_id").as("d2"), col("n").as("n2"))), "d2")
        .select("d1", "d2", "n1", "n2", "inter")
    } else {
      emitted.groupBy("d1", "d2", "n1", "n2").agg(count(lit(1)).as("inter"))
        .select("d1", "d2", "n1", "n2", "inter")
    }
  }

  /** Doc-count bound for the slim pair regime's broadcast size dim
    * (~8M × 24 B ≈ 200 MB broadcast worst case on an 8 GB heap); above
    * it [[jaccardPairRows]] carries sizes inline.
    */
  private[text] val SizeDimBroadcastCap: Int = 8000000

  /** The shared Jaccard threshold tail: threshold on the RAW ratio (same
    * predicate as the oracle), then tie-proof floor-form 6dp rounding for
    * display — IEEE-identical in both engines, unlike decimal HALF_UP vs
    * double ROUND on exact .0000005 ties (reachable: j is a
    * small-integer rational).
    */
  private def jaccardThreshold(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("jraw", col("inter") / (col("n1") + col("n2") - col("inter")))
      .where(col("jraw") >= threshold)
      .withColumn("j", floor(col("jraw") * 1000000.0 + 0.5) / 1000000.0)
      .select("d1", "d2", "inter", "j")
      .orderBy("d1", "d2")

  /** One-pass candidate-volume stats for the exact inverted-index path:
    * (candidate pairs emitted by the posting join, survivors of the
    * Jaccard threshold). This is the scale instrument behind the sf1
    * envelope's exact-family superlinearity finding: wall time in this
    * family tracks CANDIDATE VOLUME (the posting join's Σc² term over
    * per-shingle posting counts c), not memory — a denser corpus grows
    * candidates quadratically while the sketch tier's banding keeps its
    * candidate set near-linear. Both counts ride one aggregate over one
    * pair-generation pass (no double execution of the heavy lineage).
    */
  def jaccardCandidateStats(
      hashed: DataFrame, threshold: Double,
      cap: Int = DefaultGroupCap, sampleMod: Int = DefaultSampleMod): (Long, Long) = {
    val pairs = jaccardPairRows(hashed, None, cap, sampleMod)
      .withColumn("jraw", col("inter") / (col("n1") + col("n2") - col("inter")))
    val r = pairs.agg(count(lit(1)),
      sum(when(col("jraw") >= threshold, 1L).otherwise(0L))).collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** The same one-pass stats for the PPJoin path: (prefix-filter
    * candidates, verified survivors). survivors/candidates is the
    * prefix-filter SURVIVAL RATE — the efficiency number that decides
    * exact-vs-sketch routing at scale: a low rate means the prefix filter
    * is paying for many exact verifications that fail, and the corpus
    * belongs on the sketch tier (MinHash/SimHash candidates, exact verify
    * only on survivors).
    */
  def ppjoinCandidateStats(hashed: DataFrame, threshold: Double): (Long, Long) = {
    val r = ppjoinScoredCandidates(hashed, threshold).agg(count(lit(1)),
      sum(when(col("jraw") >= threshold, 1L).otherwise(0L))).collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** The df-ordered PPJoin candidate pipeline scored with exact `jraw` —
    * ONE pipeline shared by [[jaccardPairsPrefixDf]] (production) and
    * [[ppjoinCandidateStats]] (instrument), same desynchronization
    * argument as [[minhashScoredCandidates]]. Plan shape notes live on
    * [[jaccardPairsPrefixDf]].
    */
  private def ppjoinScoredCandidates(
      hashed: DataFrame, threshold: Double): DataFrame = {
    graft.functions.GraftExtensions.register(hashed.sparkSession)
    val base = hashed.repartition(col("doc_id"))
    prefixCandidates(cmsOrdered(base, sketchFrom = hashed), threshold)
      .join(base.select(col("doc_id").as("d1"), col("hs").as("h1"), col("n").as("n1")), "d1")
      .join(base.select(col("doc_id").as("d2"), col("hs").as("h2"), col("n").as("n2")), "d2")
      .withColumn("inter", expr("sorted_long_intersect_count(h1, h2)"))
      .withColumn("jraw", col("inter") / (col("n1") + col("n2") - col("inter")))
  }

  /** EXACT Jaccard near-dup pairs over hashed shingle sets via the
    * inverted index: explode (doc_id, hash), group postings per shingle,
    * count pair matches (= |A∩B|), then the Jaccard threshold on
    * |A∩B| / (n1 + n2 − |A∩B|). Output: (d1, d2, inter, j) with d1 < d2,
    * j >= threshold, sorted.
    *
    * Scale shape: every shuffled row is (long, long) — the shingle hash
    * and a doc id — so posting grouping and the pair-count aggregation
    * move a few bytes per posting regardless of document size. Pairs are
    * emitted by LAZY iterators (nothing quadratic is ever buffered in a
    * task), and hot shingles — boilerplate shared by ≫`cap` docs — are
    * split across a triangle block grid ([[gridTagged]]) so per-task
    * member arrays stay under ~4·cap (`requireBounded`) and a hot key's
    * quadratic pair work parallelizes instead of pinning one straggler
    * task. Hot detection is a deterministic 1/sampleMod id-hash sample
    * ([[hotKeys]]): one cheap extra aggregation whose misclassification
    * can only change partitioning, never output. For corpora where even
    * the pair OUTPUT of boilerplate blows up (Σ c_s²), the
    * prefix-filtered [[jaccardPairsPrefix]] / [[jaccardPairsPrefixDf]]
    * bound candidate generation itself; tests pin all paths equal.
    *
    * Each posting CARRIES its document's shingle count: the pair rows
    * arrive at the count exchange as (d1, n1, d2, n2), so the Jaccard
    * denominator needs no size-lookup joins afterwards — two fewer
    * stages. Nothing is persisted here — no cached block outlives the
    * call; multi-consumer pipelines persist at the seam ([[pairTable]]).
    */
  def jaccardPairsHashed(
      hashed: DataFrame, threshold: Double,
      cap: Int = DefaultGroupCap, sampleMod: Int = DefaultSampleMod): DataFrame =
    jaccardThreshold(jaccardPairRows(hashed, None, cap, sampleMod), threshold)

  /** Incremental near-dup pairs: exactly the [[jaccardPairsHashed]] pairs
    * that TOUCH a new-batch document (`isNew`), computed without pairing
    * old documents among themselves — the steady-state ingest shape: a
    * daily batch joins the corpus through the shared posting lists, but
    * the old×old quadratic term (the bulk of the work once the corpus
    * dwarfs the batch) is never generated. Old×old pairs are already in
    * yesterday's pair table ([[pairTable]] / its Parquet materialization);
    * union them for the full picture.
    *
    * Output is identical to filtering the full pair table on
    * `d1 new OR d2 new` (the oracle states it exactly that way); per
    * shingle group the emitter walks sorted members and skips a pair only
    * when BOTH sides are old.
    */
  def jaccardPairsIncremental(
      hashed: DataFrame,
      isNew: Column,
      threshold: Double,
      cap: Int = DefaultGroupCap,
      sampleMod: Int = DefaultSampleMod): DataFrame =
    jaccardThreshold(jaccardPairRows(hashed, Some(isNew), cap, sampleMod), threshold)

  /** The incremental per-group pair emitter: a LAZY two-index walk over the
    * id-sorted members (same shape as jaccardPairsHashed's) that skips
    * old×old pairs IN PLACE — a hot boilerplate shingle shared by many docs
    * streams through in O(1) task memory, and old×old pairs are never
    * GENERATED, not generated-then-filtered (spec-asserted directly:
    * an all-old group is empty from the first hasNext).
    */
  private[text] def incrementalPairs(
      members: Array[(Long, Long, Boolean)]): Iterator[(Long, Long, Long, Long)] =
    new Iterator[(Long, Long, Long, Long)] {
      private var i = 0
      private var j = 1
      private def step(): Unit = {
        j += 1
        if (j >= members.length) { i += 1; j = i + 1 }
      }
      private def skipOldOld(): Unit =
        while (i < members.length - 1 && !(members(i)._3 || members(j)._3)) step()
      skipOldOld()
      def hasNext: Boolean = i < members.length - 1
      def next(): (Long, Long, Long, Long) = {
        val p = (members(i)._1, members(i)._2, members(j)._1, members(j)._2)
        step(); skipOldOld()
        p
      }
    }

  /** Daily-ingest pair-table COMPACTION: yesterday's materialized pair
    * table (complete over the old corpus — typically the Parquet written by
    * [[materializePairTable]]) unioned with today's incremental pairs
    * ([[jaccardPairsIncremental]], which never generates old×old) IS the
    * from-scratch pair table of the full corpus — the steady-state loop a
    * daily ingest runs: materialize once, then per batch compute only
    * new-touching pairs and append. The two legs are DISJOINT by
    * construction (old pairs have two old ids; incremental pairs touch a
    * new id), so the union needs no dedup. Downstream consumers
    * (components, canonical selection) read the compacted table unchanged.
    *
    * Reference analogue: the ≤100-sweep incremental requeue loop
    * (`src/analysis/neighbor_analysis.py:157-169`) that re-processes only
    * unfinished work instead of the whole corpus.
    */
  def compactPairTable(
      hashed: DataFrame,
      isNew: Column,
      oldPairs: DataFrame,
      threshold: Double): DataFrame =
    oldPairs.select(col("d1"), col("d2"), col("inter"), col("j"))
      .unionByName(jaccardPairsIncremental(hashed, isNew, threshold))
      .orderBy("d1", "d2")

  /** Memoized near-dup pair stage: the (d1, d2, inter, j) Jaccard pair
    * table for `docs`, computed ONCE per (session, source plan, k,
    * threshold) and persisted — the staged-pipeline seam between candidate
    * generation and its many consumers (connected components, canonical
    * selection, audit reports, the streaming twin's bootstrap). Without it
    * every downstream query re-runs shingle → posting-list → pair-count
    * from scratch: the single most expensive dedup stage, duplicated.
    *
    * At 100 TB this memo IS a materialized table: a real pipeline writes
    * the pair stage to Parquet once (exactly like
    * [[graft.Tables.materializeBucketed]]) and every consumer reads it
    * back; the in-session persist+memo here mirrors that layout for
    * library use. An entry whose cached blocks were evicted (or dropped by
    * `spark.catalog.clearCache()`) degrades gracefully — the lineage
    * recomputes and re-marks itself for caching on next access.
    */
  /** LRU-bounded memo with release/clear lifecycle ([[graft.ops.PlanMemo]])
    * — a long-lived library session touching many distinct corpora can
    * never pin cached blocks forever.
    */
  private val pairTableMemo = new graft.ops.PlanMemo()

  /** Keyed on the canonicalized plan OBJECT, not its string: structural
    * plan equality covers LocalRelation DATA, which the string form elides
    * — two in-memory corpora with the same schema must not share an entry.
    */
  private def pairTableKey(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int): AnyRef =
    (System.identityHashCode(docs.sparkSession),
      docs.queryExecution.logical.canonicalized,
      idCol, textCol, k, threshold)

  /** Drop the memo entry for exactly these arguments and unpersist its
    * cached blocks (blocking, so callers can assert nothing survives).
    * Returns whether an entry existed. Gate queries never call this — the
    * harness WANTS cross-query reuse; long-lived library users release a
    * corpus when they are done with it.
    */
  def releasePairTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 3): Boolean =
    pairTableMemo.release(pairTableKey(docs, idCol, textCol, threshold, k))

  /** Drop EVERY memoized pair table and unpersist their blocks. */
  def clearPairTables(): Unit = pairTableMemo.clear()

  /** The pair stage as a PERSISTED TABLE: compute once, write Parquet,
    * return the readback — the deployed form of [[pairTable]]'s in-session
    * memo (downstream consumers, including other jobs and the streaming
    * twin's bootstrap, read the files; nothing recomputes and nothing
    * stays pinned in executor memory).
    */
  def materializePairTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      path: String,
      k: Int = 3): DataFrame = {
    jaccardPairsHashed(hashedShingleDocs(docs, idCol, textCol, k), threshold)
      .write.mode("overwrite").parquet(path)
    docs.sparkSession.read.parquet(path)
  }

  def pairTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 3): DataFrame =
    pairTableMemo.get(pairTableKey(docs, idCol, textCol, threshold, k)) {
      jaccardPairsHashed(hashedShingleDocs(docs, idCol, textCol, k), threshold)
    }

  /** [[jaccardPairsHashed]] over a string-shingle frame ([[shingleDocs]]
    * output) — hashes the arrays first; kept for callers/tests that hold
    * shingle strings.
    */
  def jaccardPairs(shingled: DataFrame, threshold: Double): DataFrame =
    jaccardPairsHashed(
      shingled.select(col("doc_id"), hashShingleArray(col("shingles")).as("hs"))
        .select(col("doc_id"), col("hs"), size(col("hs")).as("n")),
      threshold)

  /** PREFIX-FILTERED exact Jaccard pairs (PPJoin candidate generation) —
    * the skew-robust alternative to [[jaccardPairsHashed]] for corpora
    * whose hottest shingles make the inverted-index join output
    * (Σ c_s²) blow up.
    *
    * Prefix filter (Chaudhuri/Bayardo/Xiao PPJoin): under ANY fixed total
    * order on shingles, a doc of n shingles need index only its first
    * n − ⌈t·n⌉ + 1 — LEMMA: J(A,B) ≥ t implies A and B share an element in
    * BOTH prefixes (if all common elements sat past A's prefix then
    * |A∩B| ≤ ⌈t·|A|⌉ − 1 < t·|A|, yet J ≥ t forces |A∩B| ≥ t·|A|). Two
    * more exactness-preserving prunes run inside the candidate join:
    *   - size filter: J ≥ t forces t·max(n1,n2) ≤ min(n1,n2);
    *   - positional filter: a pair's MINIMAL common element at sorted
    *     positions (p1, p2) bounds |A∩B| ≤ 1 + min(n1−1−p1, n2−1−p2),
    *     which must reach t/(1+t)·(n1+n2). (Non-minimal matches may
    *     understate the bound — harmless: the pair still survives via its
    *     minimal-element triple.)
    * Survivors are verified with an exact two-pointer merge intersection
    * over the sorted hash arrays. Identical output to
    * [[jaccardPairsHashed]] (tests pin it); costs more stages, so it is
    * the right choice only when candidate blowup, not stage count,
    * dominates — i.e. extreme corpus scale with heavy boilerplate. The
    * production refinement at that scale is ordering shingles by ascending
    * document frequency so boilerplate never enters a prefix (needs a df
    * pass; the hash order used here is df-oblivious but free).
    */
  def jaccardPairsPrefix(hashed: DataFrame, threshold: Double): DataFrame =
    verifyCandidates(hashed,
      prefixCandidates(hashed.select(col("doc_id"), col("n"), col("hs").as("ord")), threshold),
      threshold)

  /** PPJoin candidate pairs from a (doc_id, n, ord) frame whose `ord`
    * column holds each doc's shingle hashes under ANY fixed total order
    * (the prefix lemma is order-agnostic; positional filtering only needs
    * the SAME order on both sides). Returns distinct (d1 < d2) survivors
    * of the prefix + size + positional filters.
    */
  private[text] def prefixCandidates(ordered: DataFrame, threshold: Double): DataFrame = {
    // FLOATING-POINT BOUNDARY CONTRACT (r13 review fix): the production
    // predicate is the ROUNDED comparison fl(inter/union) >= t, so every
    // derived prune must be conservative under that rounding, not under
    // real arithmetic. Three boundary-safe forms:
    //   - prefix length uses ceil(n*t − 1e-9): fl(n*t) can round UP
    //     across an integer (t=0.14, n=50 → 7.000000000000001, ceil 8 —
    //     one prefix element short, a MISSED PAIR), and the rounded
    //     predicate itself admits inter one below the real-arithmetic
    //     minimum; the nudge (≫ both error scales for any n < 1e8,
    //     ≪ 1/n so it never crosses a true integer product like n·0.5)
    //     floors both effects away;
    //   - size and positional filters compare DIVISIONS against t —
    //     division is monotone and correctly rounded, so inter ≤ min and
    //     union ≥ max give fl(min/max) ≥ fl(jraw) ≥ t for every
    //     qualifying pair (the old multiplication forms min ≥ max·t and
    //     ub ≥ S·t/(1+t) round differently from the predicate and
    //     pruned true threshold-boundary pairs).
    // At exactly-representable products (t = 0.5, every gate) all three
    // forms accept the same set, so candidate-count pins are unchanged.
    val prefixLen =
      greatest(col("n") - ceil(col("n") * threshold - 1e-9).cast("int") + 1, lit(0))
    val ex = ordered.select(col("doc_id"), col("n"),
      posexplode(slice(col("ord"), lit(1), prefixLen)).as(Seq("p", "s")))
    val ub = lit(1) + least(col("na") - 1 - col("pa"), col("nb") - 1 - col("pb"))
    ex.select(col("doc_id").as("d1"), col("n").as("na"), col("p").as("pa"), col("s"))
      .join(ex.select(col("doc_id").as("d2"), col("n").as("nb"), col("p").as("pb"), col("s")), Seq("s"))
      .where(col("d1") < col("d2") &&
        least(col("na"), col("nb")) / greatest(col("na"), col("nb")) >= threshold &&
        ub / (col("na") + col("nb") - ub) >= threshold)
      .select("d1", "d2")
      .dropDuplicates("d1", "d2")
  }

  /** Test/probe-visible alias of [[verifyCandidates]] so PpjoinProbe can
    * time the verify stage in isolation against materialized candidates.
    */
  private[text] def verifyCandidatesProbe(
      hashed: DataFrame, candidates: DataFrame, threshold: Double): DataFrame =
    verifyCandidates(hashed, candidates, threshold)

  /** Exact two-pointer merge verification of candidate pairs against the
    * hash-sorted shingle arrays — shared by both prefix variants. The
    * merge count is the native codegen expression
    * [[graft.functions.SortedLongIntersectCount]]: the `Seq[Long]` UDF it
    * replaced boxed both arrays per candidate pair and broke whole-stage
    * codegen across the fused verify stage — the hottest per-row cost in
    * `dd_ppjoin`'s r10 stage profile.
    */
  private def verifyCandidates(
      hashed: DataFrame, candidates: DataFrame, threshold: Double): DataFrame = {
    // NOT persisted (library calls must not leak cached blocks past their
    // final action — same rule as ivfTopK): the joins recompute the
    // shingle lineage per side; at scale the shingle table is a
    // materialized stage the caller persists, like [[pairTable]]
    graft.functions.GraftExtensions.register(hashed.sparkSession)
    candidates
      .join(hashed.select(col("doc_id").as("d1"), col("hs").as("h1"), col("n").as("n1")), "d1")
      .join(hashed.select(col("doc_id").as("d2"), col("hs").as("h2"), col("n").as("n2")), "d2")
      .withColumn("inter", expr("sorted_long_intersect_count(h1, h2)"))
      .withColumn("jraw", col("inter") / (col("n1") + col("n2") - col("inter")))
      .where(col("jraw") >= threshold)
      .withColumn("j", floor(col("jraw") * 1000000.0 + 0.5) / 1000000.0)
      .select("d1", "d2", "inter", "j")
      .orderBy("d1", "d2")
  }

  /** The df-ordered frame behind [[jaccardPairsPrefixDf]], exposed so the
    * spec can count candidates under each ordering.
    */
  private[text] def dfOrdered(hashed: DataFrame): DataFrame = {
    val dfreq = hashed.select(explode(col("hs")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
    hashed.select(col("doc_id"), col("n"), explode(col("hs")).as("s"))
      .join(dfreq, "s")
      .groupBy("doc_id", "n")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("o"))
      .select(col("doc_id"), col("n"),
        transform(col("o"), x => x.getField("s")).as("ord"))
  }

  /** The sketch-ordered frame behind [[jaccardPairsPrefixDf]]: shingles
    * sorted by (ESTIMATED document frequency, hash) where the estimate
    * comes from a driver-built, task-broadcast count-min sketch over the
    * shingle stream. Estimates only steer the ORDER (never a value or a
    * prune decision), and CMS merges are cell-wise additions, so the order
    * is a deterministic fixed total order — exactness and reproducibility
    * are untouched; overcounting a rare shingle merely costs a little
    * pruning quality. Exposed so the spec can count candidates under the
    * production ordering.
    *
    * `sketchFrom` feeds the sketch-build ACTION (an eager separate job —
    * exchange reuse never spans jobs, so anything in its lineage re-runs):
    * pass the PRE-repartition shingle frame so the build is a map-only
    * scan+hash pass with no shuffle; defaults to `hashed` itself.
    */
  private[text] def cmsOrdered(
      hashed: DataFrame, sketchFrom: DataFrame = null): DataFrame = {
    // depth 5 × width 2^16 longs ≈ 2.6 MB — a fixed-size broadcast at any
    // corpus scale; seed fixed for run-to-run determinism. Broadcast
    // LIFETIME is ContextCleaner-managed (reclaimed when the returned
    // plan becomes unreachable): an explicit destroy() here would break
    // re-execution of the lazy frame. Callers issuing MANY ppjoin calls
    // in one session should reuse results via the [[pairTable]] seam
    // rather than re-deriving the ordering per call.
    val src = Option(sketchFrom).getOrElse(hashed)
    val cms = src.select(explode(col("hs")).as("s"))
      .stat.countMinSketch("s", 5, 1 << 16, 42)
    val bc = hashed.sparkSession.sparkContext.broadcast(cms)
    // native codegen sort (r11): the Seq[Long] sortBy UDF this replaces
    // boxed the array and tupled every element — see
    // [[graft.functions.CmsOrderedSort]]; constructed via the column
    // bridge because the broadcast sketch is not a SQL-expressible arg
    import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
    hashed.select(col("doc_id"), col("n"),
      colOf(graft.functions.CmsOrderedSort(expression(col("hs")), bc)).as("ord"))
  }

  /** The PRODUCTION refinement of [[jaccardPairsPrefix]] at boilerplate
    * scale: shingles order by ASCENDING DOCUMENT FREQUENCY (ties by hash),
    * so a doc's prefix holds its RAREST shingles and corpus-wide
    * boilerplate never enters a prefix — the candidate join's hottest keys
    * simply disappear. Identical output to [[jaccardPairsHashed]] (the
    * prefix lemma holds under any fixed total order — spec-pinned, along
    * with the candidate-count reduction on a planted-boilerplate corpus).
    *
    * Frequencies come from a broadcast count-min sketch ([[cmsOrdered]]),
    * NOT an exact df aggregation: exact df costs a shingle-keyed shuffle
    * of the whole exploded corpus plus a per-doc re-aggregation — at
    * 100 TB that exchange is the heaviest stage in the query, and it buys
    * nothing but ordering precision that the prefix lemma doesn't need.
    * With the sketch the ordering is a MAP-ONLY transform of the shingle
    * table (one aggregate pass builds the 2.6 MB sketch). At sf0.1 the
    * swap is wall-neutral (the sketch job replaces the df stages — the
    * win is the exchange it deletes at scale); the r10 wall win here was
    * the native verify kernel (see [[verifyCandidatesProbe]] scaladoc):
    * 3.8 s → 1.6 s once the boxed `Seq[Long]` UDF stopped splitting the
    * fused verify stage out of whole-stage codegen. The exact-df form is
    * kept as [[dfOrdered]] for the spec's candidate-count comparisons.
    *
    * The MAIN action's input is pinned behind ONE deliberate doc-keyed
    * exchange: both prefix-join sides and the two verify sides consume the
    * shingle table, and without a shared exchange each branch re-runs the
    * shingle-hash UDF over the whole corpus — Spark's ReusedExchange turns
    * that into one hashing pass. The sketch build is a SEPARATE eager job
    * (exchange reuse never spans jobs), so it deliberately reads the
    * pre-repartition `hashed` frame: one map-only scan+hash pass, no
    * shuffle re-run. At 100 TB both passes read the materialized shingle
    * stage the pipeline persists explicitly (the [[pairTable]] seam note),
    * so the extra scan is a cheap re-read, not a re-hash.
    */
  def jaccardPairsPrefixDf(hashed: DataFrame, threshold: Double): DataFrame =
    ppjoinScoredCandidates(hashed, threshold)
      .where(col("jraw") >= threshold)
      .withColumn("j", floor(col("jraw") * 1000000.0 + 0.5) / 1000000.0)
      .select("d1", "d2", "inter", "j")
      .orderBy("d1", "d2")

  /** Per-document MinHash signature (the function under the
    * [[minhashSignature]] Column and the streaming twin): H minima over
    * the polynomial shingle hashes. Empty shingle sets get an all-sentinel
    * signature (they bucket together and are rejected by exact
    * verification). Parameters and arithmetic live in
    * [[graft.functions.MinhashSignature]] — one source of truth shared by
    * the native expression, this Scala path, and the streaming twin.
    */
  private[graft] def minhashSigOf(sh: Seq[String], numHashes: Int): Array[Long] =
    graft.functions.MinhashSignature.computeStrings(sh, numHashes)

  /** MinHash signature column — the native codegen expression
    * [[graft.functions.MinhashSignature]] (r11): the `Seq[String]` UDF it
    * replaces boxed every shingle through catalyst→Scala converters on the
    * full-corpus map path (the r10 verdict's #1 headroom item).
    */
  def minhashSignature(shingles: Column, numHashes: Int = 32): Column = {
    import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
    colOf(graft.functions.MinhashSignature(expression(shingles), numHashes))
  }

  /** MinHash+LSH near-dup pairs, exact-verified: band the signature
    * (bands × rowsPerBand = numHashes), bucket-join on equal bands,
    * then verify candidates with true Jaccard — output is identical to
    * [[jaccardPairs]] whenever the banding catches every true pair
    * (P[miss] = (1−J^r)^b — with 16×2 and J≥0.7 that is < 1e-6).
    */
  def minhashLshPairs(
      shingled: DataFrame,
      threshold: Double,
      numHashes: Int = 32,
      bands: Int = 16,
      cap: Int = DefaultGroupCap,
      sampleMod: Int = DefaultSampleMod): DataFrame = {
    minhashScoredCandidates(shingled, numHashes, bands, cap, sampleMod)
      .where(col("jraw") >= threshold)
      .withColumn("j", floor(col("jraw") * 1000000.0 + 0.5) / 1000000.0)
      .select("d1", "d2", "inter", "j")
      .orderBy("d1", "d2")
  }

  /** Banding candidates joined to their shingle sets with exact Jaccard
    * scored as `jraw` — ONE verify pipeline shared by [[minhashLshPairs]]
    * (the production query) and [[minhashCandidateStats]] (the scale
    * instrument), so the instrument can never silently desynchronize
    * from the arithmetic the query runs (r13 review: the empty-pair
    * crash fix had to be applied in two copies of this block).
    *
    * Exact verification joins the shingle sets back in for the few
    * surviving candidates only. The empty-pair guard is a CRASH fix, not
    * cosmetics (r13): two sub-k-token docs have the identical
    * all-sentinel signature, band into the same buckets, and reach
    * verification as a candidate whose Jaccard denominator is 0 + 0 − 0
    * — ANSI mode (Spark 4 default) throws DIVIDE_BY_ZERO on it. The
    * exact tier can never form such a pair (its pairs share a shingle by
    * construction), so dropping them preserves equality. Candidate
    * generation also filters empty sets before banding; this guard is
    * defense in depth.
    */
  private def minhashScoredCandidates(
      shingled: DataFrame,
      numHashes: Int,
      bands: Int,
      cap: Int,
      sampleMod: Int): DataFrame = {
    val sh = shingled
    minhashLshCandidates(sh, numHashes, bands, cap, sampleMod)
      .join(sh.select(col("doc_id").as("d1"), col("shingles").as("sh1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("shingles").as("sh2")), "d2")
      .where(size(col("sh1")) + size(col("sh2")) > 0)
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("jraw",
        col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")))
  }

  /** The banded-bucket candidate pairs behind [[minhashLshPairs]]
    * (distinct d1 < d2, pre-verification) — factored out so the scale
    * instrumentation ([[minhashCandidateStats]]) can count the sketch
    * tier's candidate volume on the same code path the production query
    * runs.
    */
  private[text] def minhashLshCandidates(
      shingled: DataFrame,
      numHashes: Int,
      bands: Int,
      cap: Int,
      sampleMod: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // NOT persisted (library calls must not leak cached blocks past their
    // final action — same rule as ivfTopK): the shingle lineage recomputes
    // for the signature pass and the two verification joins; at scale the
    // shingle table is a materialized stage the caller persists
    val sh = shingled

    // band rows carry only (doc_id, bucket) — never the shingle arrays —
    // so the bucket grouping shuffles a few ints per row, not documents
    // drop empty shingle sets BEFORE signature generation (r13 review):
    // every sub-k doc has the identical all-sentinel signature, so m such
    // docs would land in the SAME bucket of every band and generate
    // ~C(m,2) candidates per band that verification then discards — on a
    // short-doc-heavy corpus (titles, tweets) that is a quadratic blowup
    // for pairs that can never qualify (an empty set has j = 0 with
    // everything at any threshold > 0, and the exact tier never pairs
    // them either). This is the mechanism-level form of the ANSI-0/0
    // guard at verify, which stays as defense in depth.
    val sig = sh.where(size(col("shingles")) > 0)
      .select(col("doc_id"), minhashSignature(col("shingles"), numHashes).as("sig"))
    // posting-list candidate generation (see jaccardPairsHashed): one
    // shuffle of (bucket, doc) rows into per-bucket groups, pairs emitted
    // in-task by LAZY iterators — no banded self-join, no raw pair
    // explosion into the dedup exchange, nothing quadratic buffered on a
    // task's heap. Hot buckets (an all-identical boilerplate corpus puts
    // its whole duplicate class in one bucket per band) are split across
    // the triangle block grid ([[gridTagged]]), bounding per-task member
    // arrays at ~4·cap and spreading the bucket's quadratic candidate
    // work over blocks·(blocks+1)/2 tasks.
    val spark = shingled.sparkSession
    import spark.implicits._
    // the banded bucket VALUE is folded to a 64-bit key before anything
    // shuffles (8 bytes/row instead of a ~40-char string): a hash
    // collision merely MERGES two buckets, which can only add candidate
    // pairs that exact verification then rejects — output is unaffected,
    // so the narrow key is free
    val bucketRows = sig.select(
        explode(array((0 until bands).map { b =>
          concat_ws("_", lit(b) +:
            (0 until r).map(i => element_at(col("sig"), b * r + i + 1)): _*)
        }: _*)).as("bucket_s"),
        col("doc_id"))
      .select(xxhash64(col("bucket_s")).as("bucket"), col("doc_id"))
    val capL = cap
    gridTagged(bucketRows, "bucket", "doc_id",
        hotKeys(bucketRows, "bucket", "doc_id", cap, sampleMod))
      .select(col("bucket"), col("gci"), col("gcj"), col("gblk"), col("doc_id"))
      .as[(Long, Int, Int, Int, Long)]
      .groupByKey(t => (t._1, t._2, t._3))
      .flatMapGroups { (key, it) =>
        val (_, ci, cj) = key
        if (ci == cj) {
          val idsB = new scala.collection.mutable.ArrayBuilder.ofLong
          it.foreach(t => idsB += t._5)
          val ids = idsB.result()
          requireBounded(ids.length, capL)
          java.util.Arrays.sort(ids)
          idPairsWithin(ids)
        } else {
          val aB = new scala.collection.mutable.ArrayBuilder.ofLong
          val bB = new scala.collection.mutable.ArrayBuilder.ofLong
          var m = 0
          it.foreach { t =>
            if (t._4 == ci) aB += t._5 else bB += t._5
            m += 1
          }
          requireBounded(m, capL)
          idPairsAcross(aB.result(), bB.result())
        }
      }
      .toDF("d1", "d2")
      // the folded bucket key makes one corner REACHABLE that the
      // string key could not: two band-buckets of the SAME doc colliding
      // in xxhash64 put that doc twice in one group, and the pair walk
      // would emit (d, d) — which exact verification cannot reject
      // (j = 1.0). Guard it explicitly.
      .where(col("d1") =!= col("d2"))
      .dropDuplicates("d1", "d2")
  }

  /** One-pass (candidates, verified survivors) for the MinHash-LSH sketch
    * tier — the comparison row next to [[jaccardCandidateStats]] /
    * [[ppjoinCandidateStats]] in the scale envelope: banding keeps this
    * candidate count near-linear in corpus size while the exact tier's
    * grows with Σc², which is the measured crossover that routes 100 TB
    * dedup through the sketch tier.
    */
  def minhashCandidateStats(
      shingled: DataFrame,
      threshold: Double,
      numHashes: Int = 32,
      bands: Int = 16,
      cap: Int = DefaultGroupCap,
      sampleMod: Int = DefaultSampleMod): (Long, Long) = {
    val scored = minhashScoredCandidates(shingled, numHashes, bands, cap, sampleMod)
    val row = scored.agg(count(lit(1)),
      sum(when(col("jraw") >= threshold, 1L).otherwise(0L))).collect()(0)
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  /** 60-bit SimHash over distinct whitespace tokens: two 30-bit polynomial
    * hashes (bases 31/131) supply the bit pool; bit b of the signature is
    * set iff the token-majority vote for that bit is positive.
    * Pure integer arithmetic → bit-identical in any engine.
    *
    * The native codegen expression [[graft.functions.Simhash]] (r11): one
    * compiled pass over tokens, 60 int ops per token, fused into
    * whole-stage codegen — the Column-expression spec below
    * ([[simhashSpec]]) has identical semantics but evaluates interpreted
    * per element through Catalyst higher-order functions, ~10× slower on
    * wide corpora. Equality of the two is asserted in tests.
    */
  def simhash(text: Column): Column = {
    import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
    colOf(graft.functions.Simhash(expression(text)))
  }

  /** The Column-expression (Catalyst HOF) form of [[simhash]] — kept as
    * the executable spec the oracle SQL mirrors; tests assert it equals
    * the compiled UDF on the documents fixture.
    */
  def simhashSpec(text: Column): Column = {
    val toks = array_distinct(TextOps.whitespaceTokens(text))
    val h1 = transform(toks, t => TextOps.polyHashSpec(t, 31))
    val h2 = transform(toks, t => TextOps.polyHashSpec(t, 131))
    aggregate(sequence(lit(0), lit(59)), lit(0L), (acc, b) => {
      // bit source: h1 for bits 0..29, h2 for bits 30..59
      val vote = aggregate(
        zip_with(h1, h2, (x, y) => when(b < 30, x).otherwise(y)),
        lit(0L),
        (s, h) => {
          val shift = when(b < 30, b).otherwise(b - 30)
          val bit = pmod(floor(h / pow(lit(2.0), shift.cast("double"))).cast("long"), lit(2L))
          s + (bit * 2 - 1)
        })
      // 2^b is exactly representable in double for all b ≤ 59 → exact long
      acc + when(vote > 0, pow(lit(2.0), b.cast("double")).cast("long")).otherwise(lit(0L))
    })
  }

  /** Hamming distance between two simhash values (bit_count of xor). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: all (d1<d2) with hamming(simhash) <=
    * `maxHamming`, found WITHOUT an all-pairs join via pigeonhole
    * banding — split the `bits`-bit signature into `bands` contiguous
    * bands; a pair differing in <= maxHamming bits has at least
    * `bands − maxHamming` bands untouched, so with `bands > maxHamming`
    * every qualifying pair collides on an exact band value (the classic
    * Charikar/Manku-Jain-Sarma web-dedup shape).
    *
    * Execution decomposes at the SIGNATURE level, so no task ever holds a
    * cell's documents:
    *
    *  1. Banding runs over DISTINCT signatures only. A cell's members are
    *     u distinct 8-byte sigs (compact primitive arrays), compared
    *     in-task with lazy emitters ([[hammingPairsWithin]]/`Across` —
    *     nothing quadratic buffered); cells beyond `cellCap` distinct
    *     sigs split across the triangle block grid ([[gridTagged]], exact
    *     counting — the input is already the small sig-level set), and
    *     `requireBounded` makes the per-task bound executable. Qualifying
    *     (sa, sb, hd) SIG pairs dedup across bands at sig scale — the
    *     former doc-level dropDuplicates exchange (quadratic in group
    *     sizes, ×bands duplicated) is gone entirely.
    *  2. Within-signature (hd 0) doc pairs — the boilerplate hot case,
    *     where millions of docs share one signature — come from a plain
    *     self-equi-join on the signature: Spark's join buffers groups in
    *     spillable UnsafeRow arrays, so a multi-million-doc duplicate
    *     class streams through disk instead of a task's heap
    *     (spec: planted 2M-doc single-signature corpus).
    *  3. Cross-signature doc pairs expand by joining the qualifying sig
    *     pairs back to (doc, sig) — again spill-safe joins, with AQE free
    *     to broadcast the (typically tiny) sig-pair side.
    *
    * The pair OUTPUT is inherently quadratic in duplicate-class sizes —
    * the operator's all-pairs contract. Callers that only need clusters
    * feed [[connectedComponents]]; `sorted = false` skips the final
    * global sort so such consumers stream pairs without a
    * TakeOrdered/Sort barrier.
    *
    * Input: (doc_id, simhash). Output: (d1, d2, hd), sorted unless
    * `sorted = false`.
    */
  /** Stage [1] of the simhash decomposition, shared with
    * [[simhashComponents]]: qualifying (sa, sb, hd) SIGNATURE pairs
    * (1 <= hd <= maxHamming, sa < sb, distinct) from pigeonhole banding
    * over the DISTINCT signatures of `signed`. Grid-salted at `cellCap`
    * (exact counting — the input is already the small sig-level set);
    * per-task arrays are compact longs bounded by `requireBounded`.
    */
  private[text] def simhashSigPairs(
      signed: DataFrame,
      maxHamming: Int,
      bands: Int,
      bits: Int,
      cellCap: Int): DataFrame = {
    require(bands > maxHamming, "pigeonhole guarantee needs bands > maxHamming")
    require(bits % bands == 0, "bands must divide bits")
    val spark = signed.sparkSession
    import spark.implicits._
    val width = bits / bands
    val sigs = signed.select(col("simhash").as("sig")).distinct()
    val cells = sigs.select(col("sig"),
      explode(array((0 until bands).map { b =>
        (lit(b.toLong) * lit(1L << width)) +
          shiftrightunsigned(col("sig"), b * width)
            .bitwiseAND(lit((1L << width) - 1))
      }: _*)).as("cell"))
    val capL = cellCap
    val maxH = maxHamming
    gridTagged(cells, "cell", "sig",
        hotKeys(cells, "cell", "sig", cellCap, sampleMod = 1))
      .select(col("cell"), col("gci"), col("gcj"), col("gblk"), col("sig"))
      .as[(Long, Int, Int, Int, Long)]
      .groupByKey(t => (t._1, t._2, t._3))
      .flatMapGroups { (key, it) =>
        val (_, ci, cj) = key
        val aB = new scala.collection.mutable.ArrayBuilder.ofLong
        val bB = new scala.collection.mutable.ArrayBuilder.ofLong
        var m = 0
        it.foreach { t =>
          if (t._4 == ci) aB += t._5 else bB += t._5
          m += 1
        }
        requireBounded(m, capL)
        if (ci == cj) hammingPairsWithin(aB.result(), maxH)
        else hammingPairsAcross(aB.result(), bB.result(), maxH)
      }
      .toDF("sa", "sb", "hd")
      // sig-level dedup across colliding bands: hd is a function of
      // (sa, sb), so keeping an arbitrary row is exact
      .dropDuplicates("sa", "sb")
  }

  def simhashPairs(
      signed: DataFrame,
      maxHamming: Int,
      bands: Int = 4,
      bits: Int = 60,
      cellCap: Int = DefaultGroupCap,
      sorted: Boolean = true): DataFrame = {
    // identical projection shape on every consumer of `signed` below
    // (doc first, sig second) so the sig-keyed exchanges canonicalize
    // equal and ReusedExchange computes the signature lineage once
    val docSig = signed.select(col("doc_id"), col("simhash"))

    // [1] qualifying signature pairs over the distinct-sig banding
    val sigPairs = simhashSigPairs(signed, maxHamming, bands, bits, cellCap)

    // [2] hd-0 doc pairs: spill-safe self-join on the signature
    val within = docSig.select(col("doc_id").as("d1"), col("simhash").as("s"))
      .join(docSig.select(col("doc_id").as("d2"), col("simhash").as("s")), Seq("s"))
      .where(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), lit(0).as("hd"))

    // [3] cross-sig doc expansion: join the (small) qualifying sig pairs
    // back to docs on each side; disjoint from [2] by hd >= 1, and each
    // doc pair appears exactly once (a doc has exactly one signature)
    val cross = sigPairs
      .join(docSig.select(col("doc_id").as("da"), col("simhash").as("sa")), Seq("sa"))
      .join(docSig.select(col("doc_id").as("db"), col("simhash").as("sb")), Seq("sb"))
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2"), col("hd"))

    val out = within.unionByName(cross)
    if (sorted) out.orderBy("d1", "d2") else out
  }

  /** Connected components of the simhash near-dup graph WITHOUT
    * materializing the quadratic pair set — the right operator when a
    * caller only needs duplicate CLUSTERS (canonical selection), which is
    * what a dedup pipeline actually consumes. [[simhashPairs]] must emit
    * C(m, 2) rows for an m-doc duplicate class (its all-pairs contract);
    * at 100 TB a boilerplate class of millions of docs makes that
    * relation astronomically larger than the corpus. The components are
    * nevertheless fully determined by LINEAR structure:
    *
    *   - STAR edges: every doc connects to its signature's min-doc
    *     representative (one edge per doc — a within-sig clique and its
    *     star have identical connectivity);
    *   - SIG edges: each qualifying signature pair ([[simhashSigPairs]],
    *     the shared banding stage) lifts to one edge between the two
    *     representatives.
    *
    * Total edges: n + |qualifying sig pairs|, so [[connectedComponents]]
    * runs on input proportional to the corpus, not to duplicate-class
    * squares. Output is IDENTICAL to
    * `connectedComponents(simhashPairs(signed, …))` (same node set: docs
    * in at least one pair; same connectivity; same min-id labels) —
    * spec-pinned, and gate-checked against the recursive-CTE oracle as
    * `dd_sim_components`.
    */
  def simhashComponents(
      signed: DataFrame,
      maxHamming: Int,
      bands: Int = 4,
      bits: Int = 60,
      cellCap: Int = DefaultGroupCap): DataFrame = {
    val docSig = signed.select(col("doc_id"), col("simhash"))
    val sigPairs = simhashSigPairs(signed, maxHamming, bands, bits, cellCap)
    // per-signature representative (min doc) + membership count
    val reps = docSig.groupBy("simhash")
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("cnt"))
    // a doc participates in the pair graph iff its sig has >= 2 members
    // (within-sig clique) OR its sig qualifies against another sig —
    // restricting to those keeps the node set identical to the pair form
    val pairedSigs = sigPairs.select(col("sa").as("simhash"))
      .unionByName(sigPairs.select(col("sb").as("simhash"))).distinct()
    val activeReps = reps.join(pairedSigs, Seq("simhash"), "left_semi")
      .unionByName(reps.where(col("cnt") >= 2))
      .dropDuplicates("simhash")
      .select(col("simhash"), col("rep"))
    // star edges: (rep, doc) for every non-rep doc of an active sig —
    // rep is the sig's min doc, so d1 < d2 holds by construction
    val starEdges = docSig.join(activeReps, Seq("simhash"))
      .where(col("doc_id") =!= col("rep"))
      .select(col("rep").as("d1"), col("doc_id").as("d2"))
    // sig edges between representatives (orientation normalized)
    val sigEdges = sigPairs
      .join(reps.select(col("simhash").as("sa"), col("rep").as("ra")), Seq("sa"))
      .join(reps.select(col("simhash").as("sb"), col("rep").as("rb")), Seq("sb"))
      .select(least(col("ra"), col("rb")).as("d1"),
        greatest(col("ra"), col("rb")).as("d2"))
    connectedComponents(starEdges.unionByName(sigEdges))
  }

  /** Connected components of the Jaccard near-dup graph WITHOUT running
    * pair generation over exact-duplicate classes — the Jaccard twin of
    * [[simhashComponents]]. Docs with IDENTICAL shingle sets form j=1.0
    * cliques in the pair relation (C(m,2) rows for an m-doc boilerplate
    * class — the dominant blowup on a duplicate-heavy corpus), yet
    * contribute nothing to connectivity beyond a star:
    *
    *   - collapse docs by a 96-bit shingle-set digest (+ n)
    *     (xxhash64 + hash over the sorted distinct hash array — same
    *     collision argument as dd_normalized: P ≈ n²/2^97, and a
    *     collision additionally needs equal set SIZE);
    *   - run [[jaccardPairsHashed]] over one REPRESENTATIVE per class
    *     (identical sets have identical Jaccard to everything, so a
    *     qualifying rep pair lifts to all members and vice versa);
    *   - star edges connect each member to its class rep (min doc).
    *
    * Output is IDENTICAL to
    * `connectedComponents(jaccardPairsHashed(hashed, t))`: same node set
    * (members of multi-doc non-empty classes ∪ docs in qualifying cross
    * pairs), same connectivity, same min-id labels — spec-pinned, and
    * gate-checked as `dd_jac_components` against the same recursive-CTE
    * oracle as `dd_components`.
    */
  def jaccardComponents(
      hashed: DataFrame,
      threshold: Double,
      cap: Int = DefaultGroupCap,
      sampleMod: Int = DefaultSampleMod): DataFrame = {
    require(threshold <= 1.0, "identical sets (j = 1.0) must qualify")
    val digested = hashed.select(col("doc_id"), col("hs"),
      col("n").cast("long").as("n"),
      xxhash64(col("hs")).as("h64"), hash(col("hs")).as("h32"))
    // ONE shingle array per DISTINCT class rides the aggregation exchange
    // (first() is deterministic here: every member's hs is identical by
    // digest) — the minimum movement that gets rep sets to the pair
    // stage; per-doc rows carry only fixed-width digests
    val classes = digested.groupBy("h64", "h32", "n")
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("cnt"),
        first(col("hs")).as("hs"))
    val repHashed = classes.select(col("rep").as("doc_id"), col("hs"), col("n"))
    val repPairs = jaccardPairsHashed(repHashed, threshold, cap, sampleMod)
      .select(col("d1"), col("d2"))
    // within-class stars: identical non-empty sets have j = 1.0, which
    // qualifies at any threshold <= 1; rep is the class min, so d1 < d2
    val starEdges = digested.select(col("doc_id"), col("h64"), col("h32"), col("n"))
      .join(classes.where(col("cnt") >= 2 && col("n") > 0)
        .select(col("h64"), col("h32"), col("n"), col("rep")), Seq("h64", "h32", "n"))
      .where(col("doc_id") =!= col("rep"))
      .select(col("rep").as("d1"), col("doc_id").as("d2"))
    connectedComponents(starEdges.unionByName(repPairs))
  }

  /** Memoized COLLAPSED-CLASS seam behind [[canonicalDocsRouted]]: the
    * digest-collapsed class table (h64, h32, n, rep, cnt, shingles) is
    * consumed by the star-edge build, the LSH candidate stage (twice —
    * hot-key sample + main pass), and both verification lookups; without
    * the seam each consumer re-runs the corpus shingle scan AND the
    * digest aggregation. Same lifecycle contract as [[pairTable]]
    * (LRU-bounded, explicit release, graceful re-persist after external
    * cache clears); at 100 TB this seam is the materialized
    * "collapsed corpus" Parquet stage between the exact and sketch tiers.
    */
  private val classTableMemo = new graft.ops.PlanMemo()

  private val digestTableMemo = new graft.ops.PlanMemo()

  private def classTableKey(
      docs: DataFrame, idCol: String, textCol: String, k: Int): AnyRef =
    (System.identityHashCode(docs.sparkSession),
      docs.queryExecution.logical.canonicalized, "classTable", idCol, textCol, k)

  private def digestTableKey(
      docs: DataFrame, idCol: String, textCol: String, k: Int): AnyRef =
    (System.identityHashCode(docs.sparkSession),
      docs.queryExecution.logical.canonicalized, "digestTable", idCol, textCol, k)

  /** Drop the collapsed-class memo entry for exactly these arguments
    * (blocking unpersist, the per-doc digest entry included); returns
    * whether a class entry existed.
    */
  def releaseClassTable(
      docs: DataFrame, idCol: String, textCol: String, k: Int = 3): Boolean = {
    digestTableMemo.release(digestTableKey(docs, idCol, textCol, k))
    classTableMemo.release(classTableKey(docs, idCol, textCol, k))
  }

  /** Drop EVERY memoized collapsed-class table and unpersist their blocks. */
  def clearClassTables(): Unit = {
    digestTableMemo.clear()
    classTableMemo.clear()
  }

  /** Per-doc shingle-set digests: (doc_id, n, h64, h32) — 28 bytes a row
    * regardless of document size, from ONE fused [[hashedShingleDocs]]
    * pass (no shingle string ever allocated). Memoized + persisted: both
    * the class aggregation ([[classTable]]) and the star-edge join
    * ([[routedEdges]]) consume it, and before r20 each consumer re-ran
    * its own full-corpus shingle pass (the classTable one through the
    * ~3× slower string-array path — the dominant stage of the sf100
    * routed arm at 873 executor-CPU-s).
    */
  private[text] def digestTable(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    digestTableMemo.get(digestTableKey(docs, idCol, textCol, k)) {
      hashedShingleDocs(docs, idCol, textCol, k)
        .select(col("doc_id"), col("n").cast("long").as("n"),
          xxhash64(col("hs")).as("h64"), hash(col("hs")).as("h32"))
    }

  /** Digest-collapsed duplicate classes of a corpus: one row per DISTINCT
    * shingle set — (h64, h32, n, rep = min member doc id, cnt = member
    * count, shingles = the REP member's shingle array). Memoized +
    * persisted (see [[classTableMemo]]).
    *
    * r20 build shape (guide §2.3 — shuffle metadata, not payloads): the
    * class relation aggregates the NARROW [[digestTable]] rows (28 B/row
    * exchange instead of the former full shingle-array exchange), and the
    * shingle strings the banding/verify stages need are computed for the
    * REP DOCS ONLY (a semi-join back to the corpus — broadcast when the
    * class count allows, exactly the duplicate-heavy regime this path is
    * routed for). Previously every document paid the string-array shingle
    * pass; now only one document per class does.
    *
    * Using the rep's OWN array (formerly `first(shingles)` — an arbitrary
    * member's) is output-identical: class members hold the same shingle
    * SET (possibly in different first-occurrence orders), and every
    * consumer is order-insensitive (minhash takes a min over elements;
    * exact verify re-sorts through [[hashShingleArray]]), so ANY member's
    * array yields identical results.
    */
  private[text] def classTable(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    classTableMemo.get(classTableKey(docs, idCol, textCol, k)) {
      val narrow = digestTable(docs, idCol, textCol, k)
        .groupBy("h64", "h32", "n")
        .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("cnt"))
      val repDocs = docs.join(
        narrow.select(col("rep").as("__rep_id")),
        docs(idCol) === col("__rep_id"), "left_semi")
      narrow.join(
        shingleDocs(repDocs, idCol, textCol, k)
          .select(col("doc_id").as("rep"), col("shingles")),
        Seq("rep"))
        .select(col("h64"), col("h32"), col("n"), col("rep"), col("cnt"),
          col("shingles"))
    }

  /** The measured 100 TB dedup ROUTING, productized (r13): canonical-doc
    * selection — keep each near-dup cluster's min-id doc plus every
    * never-duplicated doc — through the three-stage route the sf1
    * crossover measurement proved out, instead of the exact pair table:
    *
    *   1. DIGEST-COLLAPSE (exact, linear): docs collapse into
    *      identical-shingle-set classes ([[classTable]]); each multi-doc
    *      class contributes member→rep star edges. This removes the
    *      C(m,2) blowup of duplicate-heavy corpora entirely — the sf1dup
    *      bracket measured 4.35 s / zero spill here vs 24-38 s with
    *      55-68 GB spill for every pair-emitting tier.
    *   2. MINHASH BANDING (sketch, near-linear): LSH candidate pairs over
    *      ONE representative per class ([[minhashLshCandidates]]) — at
    *      sf1 the banding proposed 619k candidates against the inverted
    *      index's 84.6M for the same survivor relation (137× fewer, 81%
    *      survival).
    *   3. EXACT VERIFY on the surviving candidates only: true Jaccard
    *      over hashed shingle sets (the [[SortedLongIntersectCount]]
    *      kernel — the same arithmetic as the exact tier), so a banding
    *      false positive can never reach the output.
    *
    * Then components over (star edges ∪ verified rep pairs) and a
    * broadcast anti-join drop the non-canonical ids. Output equals the
    * exact-tier `dd_canonical` composition whenever the banding catches
    * every true rep pair — P[miss] = (1−J^r)^b per pair, and the
    * candidate-stats tripwire pins survivor agreement across tiers at
    * every measured SF; gate-checked against the same recursive-CTE
    * oracle as `dd_canonical`.
    *
    * Returns the kept document rows with their original columns.
    */
  def canonicalDocsRouted(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 3,
      numHashes: Int = 32,
      bands: Int = 16,
      cap: Int = DefaultGroupCap,
      sampleMod: Int = DefaultSampleMod): DataFrame = {
    val comps = componentsRouted(
      docs, idCol, textCol, threshold, k, numHashes, bands, cap, sampleMod)
    // NO forced broadcast hint (r13 review): on a lightly-duplicated
    // corpus the drop list is tiny and AQE's runtime stats broadcast the
    // anti-join on their own (the corpus never shuffles); on a
    // duplicate-HEAVY corpus — the regime this routed path exists for —
    // the duplicates can dominate and a forced broadcast would collect
    // an O(corpus) list to the driver. Letting AQE choose degrades that
    // case to a shuffled anti-join instead of a driver OOM.
    val dropList = comps.where(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("__drop_id"))
    docs.join(dropList, docs(idCol) === col("__drop_id"), "left_anti")
  }

  /** Exact-tier canonical-doc selection — the `dd_canonical` composition
    * as a library call: full pair table → connected components → anti-join
    * drop of every non-min cluster member. Guaranteed exact output at any
    * threshold (no banding recall term); the right tier below the routed
    * crossover ([[canonicalDocsAuto]] picks). Uses the memoized
    * [[pairTable]] seam — long-lived sessions release it via
    * [[releasePairTable]] when done with the corpus.
    */
  def canonicalDocsExact(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 3): DataFrame = {
    val comps = connectedComponents(pairTable(docs, idCol, textCol, threshold, k))
    val dropList = comps.where(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("__drop_id"))
    docs.join(dropList, docs(idCol) === col("__drop_id"), "left_anti")
  }

  /** Corpus statistics behind the exact/routed dedup routing decision:
    * one map-side-combined aggregation (COUNT + an HLL sketch over the
    * text hash — no shuffle of content, O(1) result), so the decision
    * costs a single linear scan, negligible next to either tier.
    * `dupRatio` is the EXACT-duplicate fraction `1 − distinct/total`
    * (±~2% HLL error — a routing signal, not a gate value).
    */
  final case class RouteStats(nDocs: Long, dupRatio: Double) {
    /** The measured crossover rule: route when the corpus is big enough
      * that the pair table dominates, or duplicate-heavy enough that
      * digest-collapse wins outright at any size.
      */
    def useRouted(
        docCutover: Long = RoutedDocCutover,
        dupCutover: Double = RoutedDupCutover): Boolean =
      nDocs >= docCutover || dupRatio >= dupCutover
  }

  /** Crossover constants from the r13 envelope measurements: exact wins
    * ~30% at sf0.1 (5k docs: routed 2.26/2.63 s vs exact 1.79/1.69 s);
    * routed wins 3.7-12× at sf1 (50.5k docs: dd_canonical 18.5→4.5 s,
    * dd_components 20.5→5.4 s) and on the duplicate-heavy sf1dup bracket
    * (51.7→4.2 s, zero spill vs 34-68 GB). The doc cutover sits between
    * the measured 5k and 50.5k brackets, biased low because the routed
    * path's worst case is a bounded ~30% overhead while the exact tier's
    * is unbounded pair blowup; the dup cutover fires the digest-collapse
    * win early regardless of size.
    */
  val RoutedDocCutover: Long = 20000L
  val RoutedDupCutover: Double = 0.25

  def routeStats(docs: DataFrame, textCol: String): RouteStats = {
    val row = docs.agg(
      count(lit(1)).as("n"),
      approx_count_distinct(xxhash64(col(textCol))).as("nd")).head()
    val n = row.getLong(0)
    val ratio =
      if (n == 0) 0.0 else math.max(0.0, 1.0 - row.getLong(1).toDouble / n)
    RouteStats(n, ratio)
  }

  /** Auto-routed canonical-doc selection (r13 verdict ask): ONE cheap
    * stats pass ([[routeStats]]) picks the tier — the exact pair-table
    * composition below the measured crossover, the three-stage routed
    * path ([[canonicalDocsRouted]]) above it or on duplicate-heavy
    * corpora. Output equals the `dd_canonical` relation on either branch
    * (the routed branch up to the banding recall term — P[miss] =
    * (1−J^r)^b per borderline pair; both branches are gate-checked
    * against the same recursive-CTE oracle).
    */
  def canonicalDocsAuto(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 3,
      numHashes: Int = 32,
      bands: Int = 16,
      cap: Int = DefaultGroupCap,
      sampleMod: Int = DefaultSampleMod,
      docCutover: Long = RoutedDocCutover,
      dupCutover: Double = RoutedDupCutover): DataFrame =
    if (routeStats(docs, textCol).useRouted(docCutover, dupCutover))
      canonicalDocsRouted(
        docs, idCol, textCol, threshold, k, numHashes, bands, cap, sampleMod)
    else canonicalDocsExact(docs, idCol, textCol, threshold, k)

  /** Auto-routed near-dup components — [[canonicalDocsAuto]]'s decision
    * applied to the components relation: the exact
    * `connectedComponents(pairTable(...))` composition below the measured
    * crossover, [[componentsRouted]] above it or on duplicate-heavy
    * corpora. Both branches are gate-checked against the same
    * recursive-CTE oracle as `dd_components`.
    */
  def componentsAuto(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 3,
      numHashes: Int = 32,
      bands: Int = 16,
      cap: Int = DefaultGroupCap,
      sampleMod: Int = DefaultSampleMod,
      docCutover: Long = RoutedDocCutover,
      dupCutover: Double = RoutedDupCutover): DataFrame =
    if (routeStats(docs, textCol).useRouted(docCutover, dupCutover))
      componentsRouted(
        docs, idCol, textCol, threshold, k, numHashes, bands, cap, sampleMod)
    else connectedComponents(pairTable(docs, idCol, textCol, threshold, k))

  /** Near-dup connected components through the SAME three-stage route as
    * [[canonicalDocsRouted]] — output identical to
    * `connectedComponents(jaccardPairsHashed(hashed, t))` (the
    * `dd_components` relation) whenever the banding catches every true
    * rep pair: same node set (members of multi-doc non-empty classes ∪
    * docs in qualifying cross pairs), same connectivity, same min-id
    * labels. Gate-checked against the same recursive-CTE oracle.
    */
  def componentsRouted(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 3,
      numHashes: Int = 32,
      bands: Int = 16,
      cap: Int = DefaultGroupCap,
      sampleMod: Int = DefaultSampleMod): DataFrame =
    connectedComponents(routedEdges(
      docs, idCol, textCol, threshold, k, numHashes, bands, cap, sampleMod))

  /** The routed edge relation (stars ∪ verified rep pairs) both routed
    * entry points build on — stages 1-3 of the routing rule.
    */
  private[text] def routedEdges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int,
      numHashes: Int,
      bands: Int,
      cap: Int,
      sampleMod: Int): DataFrame = {
    // STRICT lower bound (r13 review): at threshold <= 0 the verify stage
    // would keep banding candidates with ZERO shared shingles (0 >= 0),
    // pairs the exact tier can never emit — silently breaking the
    // output-equality contract. Fail loud on the degenerate parameter.
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold — the routed path's " +
        "equality with the exact tier requires qualifying pairs to share " +
        "at least one shingle")
    import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
    val classes = classTable(docs, idCol, textCol, k)

    // stage 2: banding over class representatives only
    val reps = classes.select(col("rep").as("doc_id"), col("shingles"))
    val candidates = minhashLshCandidates(reps, numHashes, bands, cap, sampleMod)

    // stage 3: exact verify on survivors only (hashed-set arithmetic —
    // identical j values to the exact tier's jaccardThreshold)
    val repHashed = reps
      .select(col("doc_id"), hashShingleArray(col("shingles")).as("hs"))
      .select(col("doc_id"), col("hs"), size(col("hs")).cast("long").as("n"))
    val inter = colOf(graft.functions.SortedLongIntersectCount(
      expression(col("h1")), expression(col("h2"))))
    // r20 join-strategy pin (guide §3.1): these two joins attach the
    // hashed-shingle ARRAYS to the candidate pairs, so their shuffled
    // sides are the fattest relations of the routed path (~5 GB at the
    // sf100 bracket). Planned as SortMergeJoin, the sorts of the
    // array-carrying sides spilled 16.4 GB per run; AQE's runtime
    // SMJ→SHJ rewrite (SessionTuning) sat right at its per-partition
    // threshold here and flapped between plans across runs. The hints
    // pin ShuffledHashJoin with the SMALL side as build — the bare
    // (d1, d2) candidate pairs for the first join, the per-rep digest
    // rows for the second — so the array side always STREAMS and nothing
    // sorts. Build-side memory is one partition of the hinted side
    // (~12 MB / ~75 MB at the sf100 bracket); it scales down with
    // shuffle-partition count, the same §2.2 sizing rule as every other
    // exchange. Output unchanged (join strategy only); the sf0.1 gate
    // cost of forgoing a size-based broadcast here measured inside noise
    // (the candidate/rep relations are a few hundred rows there).
    val repPairs = candidates.hint("shuffle_hash")
      .join(repHashed.select(col("doc_id").as("d1"), col("hs").as("h1"),
        col("n").as("n1")), "d1")
      .join(repHashed.select(col("doc_id").as("d2"), col("hs").as("h2"),
        col("n").as("n2")).hint("shuffle_hash"), "d2")
      .withColumn("inter", inter)
      .where(col("inter") / (col("n1") + col("n2") - col("inter")) >= threshold)
      .select(col("d1"), col("d2"))

    // stage 1's edges: member → class rep for multi-doc non-empty classes
    // (identical non-empty sets have j = 1.0, qualifying at any t <= 1;
    // empty shingle sets are not duplicates of each other). This per-doc
    // pass needs ONLY the digest columns, so it reads the memoized
    // [[digestTable]] — the SAME persisted frame the class aggregation
    // consumed, so the corpus shingle pass runs once per corpus, not once
    // per consumer (r20; the digest arithmetic identity to the string
    // path — hashShingleArray(shingles) == HashedShingles — stays
    // spec-pinned).
    val digested = digestTable(docs, idCol, textCol, k)
    val starEdges = digested
      .join(classes.where(col("cnt") >= 2 && col("n") > 0)
        .select(col("h64"), col("h32"), col("n"), col("rep")),
        Seq("h64", "h32", "n"))
      .where(col("doc_id") =!= col("rep"))
      .select(col("rep").as("d1"), col("doc_id").as("d2"))

    starEdges.unionByName(repPairs)
  }

  /** Connected components over near-dup pairs — the canonical-document
    * selection step of a dedup pipeline (clusters of transitively-similar
    * docs collapse to their min id).
    *
    * Input: (d1, d2) pair rows. Output: (doc_id, component) with
    * component = min doc id of the cluster, sorted.
    *
    * Hybrid execution: thresholded near-dup EDGES are orders of magnitude
    * smaller than the corpus (they are the duplicates), so up to
    * `smallEdgeLimit` edges a driver-side union-find resolves components
    * in one pass — no per-round Spark jobs. Above the limit the
    * distributed min-label propagation below takes over (one join + one
    * aggregation per round, O(diameter) rounds, counted fixpoint).
    */
  def connectedComponents(
      pairs: DataFrame,
      maxIterations: Int = 25,
      smallEdgeLimit: Long = 2000000L): DataFrame = {
    // smallEdgeLimit default 2M (r13 review, down from 10M): the driver
    // path collects every edge and builds a boxed-Long union-find map —
    // roughly 150-200 B/edge of driver heap, so 2M edges ≈ 400 MB, safe
    // on a default driver, where 10M (~2-3 GB peak) OOMed
    // spark.driver.memory=1g long before the cutoff. Callers with big
    // drivers can raise it; the distributed path is correct at any size.
    val spark = pairs.sparkSession
    import spark.implicits._
    val edgeDs = pairs.select(col("d1").cast("long"), col("d2").cast("long")).as[(Long, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (edgeDs.count() <= smallEdgeLimit) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val next = parent(c); parent(c) = r; c = next }
        r
      }
      edgeDs.collect().foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labels = parent.keys.toSeq.map(id => (id, find(id))).sortBy(_._1)
      edgeDs.unpersist()
      labels.toDF("doc_id", "component").orderBy("doc_id")
    } else {
      // the iterative path's result is checkpoint-backed, so the source
      // edge cache can be dropped as soon as the rounds complete — a
      // FINALLY, or the largest relation in the job stays pinned for the
      // session on both the success and the non-convergence path
      try iterativeComponents(edgeDs.toDF("d1", "d2"), maxIterations)
      finally edgeDs.unpersist()
    }
  }

  /** Distributed components (the > smallEdgeLimit path): min-label HOP
    * (each node takes the min label among itself and its neighbors) plus
    * POINTER DOUBLING (comp := comp(comp)) per round. The hop alone moves
    * labels one edge per round — a diameter-D chain needs D rounds and a
    * capped loop returns silently-wrong labels past the cap (a real bug
    * this replaced); doubling composes the label pointers so convergence
    * is O(log D) — 25 rounds covers any realistic graph, and
    * non-convergence now throws instead of mislabeling.
    *
    * Each round ends in an eager checkpoint: without it the plan nests one
    * join DEEPER per round and Catalyst's plan stringification alone OOMs
    * around 20 rounds (observed). WHICH checkpoint is a runtime knob
    * (r11): set `graft.components.checkpointDir` on the session conf to a
    * reliable location (HDFS/S3 on a cluster) and every round writes a
    * RELIABLE `checkpoint` there — a lost executor replays from storage
    * instead of failing the 20-round job. Unset, rounds use
    * `localCheckpoint` (executor-local blocks — fine on local[N] and for
    * short graphs, documented as not surviving executor loss). Both paths
    * are spec-pinned to identical labels (`ComponentsCheckpointSpec`).
    */
  private def iterativeComponents(pairs: DataFrame, maxIterations: Int): DataFrame = {
    val spark = pairs.sparkSession
    val reliableDir = spark.conf.getOption("graft.components.checkpointDir")
    reliableDir.foreach(spark.sparkContext.setCheckpointDir)
    def materialize(df: DataFrame): DataFrame =
      if (reliableDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unpersist in a FINALLY (r13 review): the non-convergence require
    // below must not leak the bidirectional edge cache for the session
    try {
    var labels = materialize(
      edges.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // the extra .as aliases force fresh expression ids: `propagated`
      // derives from `labels`, so without them the two union branches
      // share attribute ids and Catalyst's Union constraint rewrite
      // fails with "key not found: id#N"
      val propagated = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("comp").as("comp"))
      val hopped = materialize(
        labels.select(col("id").as("id"), col("comp").as("comp"))
          .union(propagated)
          .groupBy("id").agg(min("comp").as("comp")))
      val doubled = materialize(
        hopped.as("a")
          .join(hopped.select(col("id").as("cid"), col("comp").as("ccomp")).as("b"),
            col("a.comp") === col("b.cid"), "left")
          .select(col("a.id").as("id"),
            least(col("a.comp"), coalesce(col("ccomp"), col("a.comp"))).as("comp")))
      val changed = doubled.join(labels.select(col("id"), col("comp").as("old")), "id")
        .where(col("comp") =!= col("old")).count()
      labels = doubled
      converged = changed == 0
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIterations doubling rounds")
    labels.select(col("id").as("doc_id"), col("comp").as("component"))
      .orderBy("doc_id")
    } finally edges.unpersist()
  }
}
