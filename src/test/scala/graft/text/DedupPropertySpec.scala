package graft.text

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.SparkSpec

/** Randomized equivalence sweeps for the near-dup pair tiers. The planted
  * corpora in TextOpsSpec pin specific behaviors; these sweep the space of
  * mutation-structured random corpora and thresholds — the r13 PPJoin
  * boundary bug (a qualifying pair pruned when the rounded predicate and
  * the real-arithmetic prefix filters desynchronized) is exactly the class
  * a fixed corpus misses and a threshold/structure sweep catches.
  */
class DedupPropertySpec extends SparkSpec {

  /** Mutation-structured corpus: docs are random token strings over a small
    * vocab, and with probability ~mutRate a doc is a lightly mutated copy
    * of an earlier one — generating Jaccard values that CLUSTER around the
    * interesting thresholds instead of the all-or-nothing extremes.
    */
  private def corpus(seed: Int, nDocs: Int, vocabSize: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector.tabulate(vocabSize)(i => s"w$i")
    val docs = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until nDocs).foreach { i =>
      if (i > 0 && rnd.nextDouble() < 0.4) {
        val base = docs(rnd.nextInt(docs.size)).split(" ")
        val out = base.clone()
        (0 until rnd.nextInt(4)).foreach { _ =>
          out(rnd.nextInt(out.length)) = vocab(rnd.nextInt(vocab.size))
        }
        docs += out.mkString(" ")
      } else {
        val len = 3 + rnd.nextInt(28)
        docs += Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
    }
    docs.toSeq
  }

  private def docDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("property: PPJoin prefix tier == inverted-index tier on random corpora and thresholds") {
    val gen = for {
      seed <- Gen.choose(1, 1000000)
      nDocs <- Gen.choose(2, 40)
      vocab <- Gen.choose(5, 14)
      thr <- Gen.oneOf(0.14, 0.3, 0.5, 0.62, 0.8, 0.95)
    } yield (seed, nDocs, vocab, thr)
    val prop = Prop.forAll(gen) { case (seed, nDocs, vocab, thr) =>
      val hashed = Dedup.hashedShingleDocs(docDf(corpus(seed, nDocs, vocab)),
        "doc_id", "text")
      val inverted = pairSet(Dedup.jaccardPairsHashed(hashed, thr))
      val prefix = pairSet(Dedup.jaccardPairsPrefixDf(hashed, thr))
      if (inverted != prefix) {
        System.err.println(s"MISMATCH seed=$seed nDocs=$nDocs vocab=$vocab thr=$thr\n" +
          s"  inverted-only: ${(inverted -- prefix).take(5)}\n" +
          s"  prefix-only:   ${(prefix -- inverted).take(5)}")
      }
      inverted == prefix
    }
    val res = check(Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: pointer-doubling == union-find == reference on random graphs") {
    import spark.implicits._
    val gen = for {
      seed <- Gen.choose(1, 1000000)
      nNodes <- Gen.choose(2, 200)
      nEdges <- Gen.choose(1, 400)
    } yield (seed, nNodes, nEdges)
    val prop = Prop.forAll(gen) { case (seed, nNodes, nEdges) =>
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      if (edges.isEmpty) true
      else {
        // reference: in-test union-find, component = min id
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
            parent(hi) = lo }
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = nodes.map(n => (n, find(n))).sortBy(_._1)
        val pairs = edges.toDF("d1", "d2")
        val viaUf = Dedup.connectedComponents(pairs)
          .as[(Long, Long)].collect().toSeq.sortBy(_._1)
        // smallEdgeLimit=0 forces the distributed pointer-doubling path
        val viaPd = Dedup.connectedComponents(pairs, smallEdgeLimit = 0L)
          .as[(Long, Long)].collect().toSeq.sortBy(_._1)
        if (viaUf != want || viaPd != want)
          System.err.println(s"COMPONENTS MISMATCH seed=$seed n=$nNodes e=$nEdges")
        viaUf == want && viaPd == want
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: LSH pairs ⊆ exact pairs with identical (inter, j) on random corpora") {
    val gen = for {
      seed <- Gen.choose(1, 1000000)
      nDocs <- Gen.choose(2, 40)
      vocab <- Gen.choose(5, 14)
      thr <- Gen.oneOf(0.3, 0.5, 0.7)
    } yield (seed, nDocs, vocab, thr)
    val prop = Prop.forAll(gen) { case (seed, nDocs, vocab, thr) =>
      val df = docDf(corpus(seed, nDocs, vocab))
      val shingled = Dedup.shingleDocs(df, "doc_id", "text")
      val exact = pairSet(Dedup.jaccardPairs(shingled, thr))
      val lsh = pairSet(Dedup.minhashLshPairs(shingled, thr))
      // banding can MISS a qualifying pair, never invent or mis-score one
      if (!lsh.subsetOf(exact)) {
        System.err.println(s"LSH INVENTED seed=$seed nDocs=$nDocs vocab=$vocab " +
          s"thr=$thr: ${(lsh -- exact).take(5)}")
      }
      lsh.subsetOf(exact)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
