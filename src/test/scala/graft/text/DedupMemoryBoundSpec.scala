package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.concurrent.TimeLimits.failAfter
import org.scalatest.time.{Seconds, Span}
import graft.SparkSpec

/** Executable evidence for the per-task memory bounds of the banded pair
  * generators (the round-10 hardening item): hot groups never materialize
  * on a task's heap —
  *
  *  - a multi-million-doc duplicate class (one signature shared by 2M
  *    docs — every band cell "hot") streams through simhashPairs' spill-
  *    safe self-join; the pre-decomposition code built the C(2M,2) pair
  *    vector inside one flatMapGroups task and could not complete at all;
  *  - a cell with more DISTINCT signatures than `cellCap` splits across
  *    the triangle block grid, with the in-task `requireBounded` check
  *    proving no member array exceeded the salted working bound (the
  *    spec would throw otherwise), and the output still exactly equals
  *    brute force;
  *  - the same grid bound holds for hot shingle postings (Jaccard) and
  *    hot LSH buckets (MinHash), pinned equal to the unsalted path.
  */
class DedupMemoryBoundSpec extends SparkSpec {

  test("simhashPairs: 2M docs sharing ONE signature stream through without " +
    "task-heap materialization (hd-0 via spill-safe self-join)") {
    import spark.implicits._
    // every band cell of this corpus is maximally hot: all 2M docs share
    // all 4 band values. The decomposition keeps tasks at ONE distinct
    // sig; doc expansion rides the self-join, which buffers groups in
    // spillable UnsafeRow arrays — so taking a few pairs off the top is
    // linear work. (The output SET is quadratic by contract — the spec
    // must not count it; sorted = false avoids a TakeOrdered scan.)
    val signed = spark.range(2000000L)
      .select(col("id").as("doc_id"), lit(0x0ABC_DEF0_1234_5L).as("simhash"))
    failAfter(Span(120, Seconds)) {
      val got = Dedup.simhashPairs(signed, maxHamming = 3, sorted = false)
        .limit(10).collect()
      assert(got.length === 10)
      got.foreach { r =>
        assert(r.getLong(0) < r.getLong(1))
        assert(r.getInt(2) === 0)
      }
    }
  }

  test("simhashPairs: cell with distinct sigs beyond cellCap splits across " +
    "the block grid and still equals brute force") {
    import spark.implicits._
    // 3000 docs with DISTINCT signatures all sharing band 0 (low 15 bits
    // equal => one shared hot cell) plus a planted qualifying cluster;
    // cellCap 256 forces blocks = ceil(3000/256) = 12. requireBounded
    // inside every grid task throws if any member array exceeds the
    // salted working bound, so a green run IS the memory-bound proof.
    val width = 15
    val low = 0x4321L // shared band-0 value
    val rnd = new scala.util.Random(7)
    val cluster = (0 until 30).map { i =>
      // base high pattern with <=1 extra bit flipped: pairwise hd <= 2
      val base = 0x0FF0_0F00L << width
      val s = if (i == 0) base else base ^ (1L << (width + (i % 40)))
      (1000L + i, s | low)
    }
    val noise = (0 until 2970).map { i =>
      val high = rnd.nextLong() & ((1L << 45) - 1)
      (2000L + i, (high << width) | low)
    }
    val all = (cluster ++ noise).distinct
    val signed = all.toDF("doc_id", "simhash")
    val got = Dedup.simhashPairs(signed, maxHamming = 3, cellCap = 256)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (da, sa) <- all; (db, sb) <- all if da < db
      hd = java.lang.Long.bitCount(sa ^ sb) if hd <= 3
    } yield (da, db, hd)).toSet
    assert(got === want)
    assert(want.size >= 30 * 29 / 2, "planted cluster must qualify")
  }

  test("simhashComponents: linear star+sig edges give exactly the pair-graph components") {
    import spark.implicits._
    // mixed corpus: two within-sig duplicate classes, a cross-sig cluster
    // (hd 2 chain), singleton sigs qualifying nothing, singleton sigs
    // qualifying ACROSS (both node-set edge cases) — pinned against
    // components over the full quadratic pair relation
    val s0 = 0x0123_4567_89AL
    val rows =
      (0L until 40L).map(i => (i, s0)) ++                 // class A (clique)
        (100L until 130L).map(i => (i, s0 ^ 0x3L)) ++     // class B, hd 2 from A
        Seq((200L, s0 ^ 0xFF00000000L)) ++                // singleton, hd 8 from all
        Seq((300L, 0x7777_0000_111L), (301L, 0x7777_0000_111L ^ 0x1L)) ++ // 2 singleton sigs, hd 1
        (400L until 420L).map(i => // noise: multiplicative-hash sigs, pairwise far
          (i, (i * 2654435761L) & ((1L << 60) - 1)))
    val signed = rows.toDF("doc_id", "simhash")
    val got = Dedup.simhashComponents(signed, maxHamming = 3)
      .as[(Long, Long)].collect().toSeq
    val want = Dedup.connectedComponents(
        Dedup.simhashPairs(signed, maxHamming = 3))
      .as[(Long, Long)].collect().toSeq
    assert(got === want)
    val labels = got.toMap
    assert(labels(129L) === 0L, "A and B must merge through the hd-2 sig edge")
    assert(labels(301L) === 300L, "singleton-sig pair must form its own component")
    assert(!labels.contains(200L) && !labels.contains(400L),
      "docs with no qualifying pair must not appear")

    // the operator's reason to exist: a duplicate class big enough that
    // the pair relation (C(50k,2) ≈ 1.25e9 rows) would dwarf the corpus —
    // components run on ~n star edges instead, in seconds
    val big = spark.range(50000L)
      .select(col("id").as("doc_id"), lit(0x0BAD_CAFE_001L).as("simhash"))
      .unionByName(spark.range(50L)
        .select((col("id") + 60000L).as("doc_id"),
          lit(0x0BAD_CAFE_001L ^ 0x11L).as("simhash"))) // hd 2 satellite class
    val comps = Dedup.simhashComponents(big, maxHamming = 3)
    assert(comps.count() === 50050L)
    assert(comps.agg(org.apache.spark.sql.functions.countDistinct(col("component")))
      .as[Long].head() === 1L, "one merged cluster")
  }

  test("jaccardPairsHashed: hot-shingle grid path equals the unsalted path " +
    "(full and incremental)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")
    // shared boilerplate prefix = hot shingles riding every doc; planted
    // near-dup pairs must survive both paths identically
    def doc(): String = "common boiler plate header " +
      Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = Seq.tabulate(120)(_ => doc())
    val texts = base.updated(5, base(4).replaceFirst("alpha", "omega"))
      .updated(77, base(76).replaceFirst("beta", "omega"))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val hashed = Dedup.hashedShingleDocs(df, "doc_id", "text")
    val plain = Dedup.jaccardPairsHashed(hashed, 0.5).collect().toSeq
    // cap 8 & exact counting: the boilerplate shingles (count 120 > 8)
    // split into ceil(120/8) = 15 blocks — 120 grid cells each bounded
    val salted = Dedup.jaccardPairsHashed(hashed, 0.5, cap = 8, sampleMod = 1)
      .collect().toSeq
    assert(salted === plain)
    assert(plain.nonEmpty, "fixture must produce pairs")
    val isNew = col("doc_id") >= 60
    val plainInc = Dedup.jaccardPairsIncremental(hashed, isNew, 0.5).collect().toSeq
    val saltedInc = Dedup.jaccardPairsIncremental(hashed, isNew, 0.5,
      cap = 8, sampleMod = 1).collect().toSeq
    assert(saltedInc === plainInc)
    assert(plainInc.nonEmpty && plainInc.size < plain.size,
      "incremental fixture must drop old×old pairs")
  }

  test("jaccardPairRows: slim (broadcast size dim) and wide (inline-carry) " +
    "regimes are output-identical") {
    // r16: the slim regime halves the Σc² candidate exchange's row width
    // and re-attaches sizes via a broadcast dim — valid only while the
    // CORPUS is broadcastable, so past SizeDimBroadcastCap docs the wide
    // regime ships n1/n2 inline (a 20B-doc corpus must never become a
    // broadcast table). Both regimes must agree bit-for-bit; sizeDimCap=0
    // forces wide on any input.
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu")
    def doc(): String = Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = Seq.tabulate(90)(_ => doc())
    val texts = base.updated(3, base(2)).updated(40, base(39) + " ant")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val hashed = Dedup.hashedShingleDocs(df, "doc_id", "text")
    def rows(sizeCap: Int) = Dedup.jaccardPairRows(hashed, None,
        cap = Dedup.DefaultGroupCap, sampleMod = Dedup.DefaultSampleMod,
        sizeDimCap = sizeCap)
      .collect().map(_.toString).sorted.toSeq
    val slim = rows(8000000)
    val wide = rows(0)
    assert(slim.nonEmpty, "fixture must produce candidate pairs")
    assert(slim === wide)
    // incremental variant crosses the same fork
    def incRows(sizeCap: Int) = Dedup.jaccardPairRows(hashed,
        Some(col("doc_id") >= 45), cap = Dedup.DefaultGroupCap,
        sampleMod = Dedup.DefaultSampleMod, sizeDimCap = sizeCap)
      .collect().map(_.toString).sorted.toSeq
    assert(incRows(8000000) === incRows(0))
  }

  test("jaccardPairRows: the regime fork is observable in the plan — slim " +
    "plants the collected dim as a LocalRelation, wide plants none") {
    // r17: the slim dim is collected once and rebuilt as a LocalRelation
    // (BroadcastExchange over LocalTableScan = zero dim-build jobs); the
    // wide regime must never hold ANY driver-side relation. Guards the
    // r16 ADVICE fix (single collect, no per-dim lineage re-execution)
    // against a regression back to distributed dim builds.
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("oak", "elm", "fir", "ash", "yew", "box")
    def doc(): String = Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = Seq.tabulate(90)(_ => doc())
    val texts = base.updated(7, base(6))
    // parquet round-trip: a Seq.toDF source is itself a LocalRelation,
    // which would defeat the regime probe below — a file scan keeps the
    // collected size dim as the plan's ONLY possible LocalRelation
    val pq = java.nio.file.Files.createTempDirectory("skewdim").toString + "/docs"
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(pq)
    val df = spark.read.parquet(pq)
    val hashed = Dedup.hashedShingleDocs(df, "doc_id", "text")
    def run(sizeCap: Int) =
      Dedup.jaccardPairRows(hashed, None, cap = Dedup.DefaultGroupCap,
        sampleMod = Dedup.DefaultSampleMod, sizeDimCap = sizeCap)
    val slim = run(8000000)
    assert(slim.queryExecution.optimizedPlan.toString.contains("LocalRelation"),
      "an under-cap corpus must take the broadcast-dim slim regime (collected dim)")
    val wide = run(0)
    assert(!wide.queryExecution.optimizedPlan.toString.contains("LocalRelation"),
      "the wide regime must carry sizes inline — no driver-side relation at any size")
    val a = slim.collect().map(_.toString).sorted.toSeq
    val b = wide.collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a === b)
  }

  test("jaccardComponents: digest-collapsed path equals pair-graph components") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def doc(): String = Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // planted: an exact-dup class of 25, a second class of 3, a near-dup
    // bridge between a class member and an outside doc, isolated docs,
    // and an empty doc (empty shingle set must never cluster)
    val dup1 = doc(); val dup2 = doc()
    val bridge = dup1.replaceFirst("alpha", "omega")
    val texts = Seq.fill(25)(dup1) ++ Seq.fill(3)(dup2) ++
      Seq(bridge, "") ++ Seq.tabulate(15)(_ => doc())
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val hashed = Dedup.hashedShingleDocs(df, "doc_id", "text")
    val got = Dedup.jaccardComponents(hashed, 0.5)
      .as[(Long, Long)].collect().toSeq
    val want = Dedup.connectedComponents(Dedup.jaccardPairsHashed(hashed, 0.5))
      .as[(Long, Long)].collect().toSeq
    assert(got === want)
    val labels = got.toMap
    assert(labels(24L) === 0L, "exact-dup class clusters to its min id")
    assert(labels.get(28L).contains(0L) || labels(28L) === labels(0L),
      "the near-dup bridge joins the class")
    assert(!labels.contains(29L), "empty shingle set never clusters")

    // the blowup case: 30k identical docs = 4.5e8 pair rows in the pair
    // relation, ONE rep + 30k star edges here — clusters in seconds
    val bigDocs = spark.range(30000L)
      .select(col("id").as("doc_id"),
        lit("alpha beta gamma delta epsilon zeta eta").as("text"))
    val comps = Dedup.jaccardComponents(
      Dedup.hashedShingleDocs(bigDocs, "doc_id", "text"), 0.5)
    assert(comps.count() === 30000L)
  }

  test("requireBounded fails LOUD when a hot key escapes detection") {
    import spark.implicits._
    // sampleMod far above the corpus size: the id-hash sample keeps ~no
    // rows, hot detection sees nothing, and a 1200-member boilerplate
    // posting lands unsalted in one task with cap 8 (working bound
    // 4·8 + 1024 = 1056) — the in-task bound must throw its diagnostic
    // instead of buffering toward an OOM (with the default sampleMod
    // this configuration is Chernoff-unreachable; the spec forces the
    // miss to prove the net)
    val texts = Seq.tabulate(1200)(i => s"common boiler plate unique$i")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val hashed = Dedup.hashedShingleDocs(df, "doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.jaccardPairsHashed(hashed, 0.5, cap = 8, sampleMod = 1000000).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("salted working bound")),
      s"expected the requireBounded diagnostic, got: ${messages(ex).mkString(" | ")}")
  }

  test("minhashLshPairs: hot-bucket grid path equals the unsalted path") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("data", "spark", "query", "join", "scan", "agg",
      "row", "col", "sort", "hash", "merge", "batch")
    def doc(): String = Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // 40 IDENTICAL docs: one bucket per band holds all of them (the hot
    // LSH bucket), plus distinct noise and one planted near-dup
    val dup = doc()
    val texts = Seq.fill(40)(dup) ++ Seq.tabulate(30)(_ => doc()) :+
      dup.replaceFirst("data", "datum")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sh = Dedup.shingleDocs(df, "doc_id", "text")
    val plain = Dedup.minhashLshPairs(sh, 0.5).collect().toSeq
    val salted = Dedup.minhashLshPairs(sh, 0.5, cap = 8, sampleMod = 1).collect().toSeq
    assert(salted === plain)
    assert(plain.size >= 40 * 39 / 2, "hot duplicate class must pair")
  }
}
