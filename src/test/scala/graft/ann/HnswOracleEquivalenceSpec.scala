package graft.ann

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** Pins the two claims the r14 `ann_hnsw_topk` oracle rests on.
  *
  * 1. DUMP FIDELITY: [[Ann.hnswIndexDump]] rebuilds on the driver exactly
  *    the shard graphs [[Ann.hnswTopK]]'s tasks construct — asserted by
  *    searching the DUMPED structure and matching the gate's output row
  *    for row (any divergence in entry, levels, or adjacency diverges
  *    the search).
  *
  * 2. BATCH-EXPANSION EQUIVALENCE: the oracle replays the beam sweep in
  *    whole-expansion batches (res' = top-ef(res ∪ unvisited), cand' =
  *    sorted(rest ∪ unvisited)) instead of the kernel's per-neighbor
  *    bounded-heap insertion. Equal because (a) a bounded heap streamed
  *    over items retains exactly the set top-ef of everything examined —
  *    an item rejected against the then-worst is dominated by ef retained
  *    items and the worst only improves; (b) carrying dominated items in
  *    the candidate heap never changes which nodes get EXPANDED — a
  *    dominated item pops only after everything better, at which point it
  *    sits below the (monotone) worst with a full heap, the same
  *    immediate termination the faithful heap reaches on its next pop.
  *    The search here implements the BATCH form; [[NaiveAnn.hnswTopK]]
  *    and the production kernel implement the heap-faithful form; the
  *    beam-pressure config (ef = 12 ≪ shard size) makes termination and
  *    the ef-cap bind so a flaw in the argument would diverge rows.
  *
  * The DuckDB side of the same SQL (types, recursion, joins) is exercised
  * by the driver's crosscheck; these tests pin the ALGORITHMIC content.
  */
class HnswOracleEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(dir: String): Seq[(Long, Array[Double])] =
    Tables.embeddings(spark, dir)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
      .map { case (id, v) => (id, v.map(_.toDouble)) }

  /** The oracle's batch-expansion search, driven from the dump: greedy
    * descent (argmax by (sim DESC, id ASC) to a fixpoint per level), then
    * the beam loop with one pop + whole-expansion batch per step.
    * Mirrors the recursive CTEs in TextQueries.hnswOracle operation for
    * operation, including the (negs = −sim, id) orderings.
    */
  private def batchCandidates(
      dump: Array[Ann.HnswShardDump],
      rows: Seq[(Long, Array[Double])],
      queryIds: Seq[Long],
      k: Int,
      ef: Int): Seq[(Long, Long)] = {
    val vn = rows.map { case (id, v) => id -> NaiveAnn.normalize(v) }.toMap
    val efs = math.max(ef, k + 1)
    dump.toSeq.flatMap { sh =>
      val adj: Map[(Long, Int), Array[Long]] =
        sh.adjacency.map { case (n, l, ns) => (n, l) -> ns }.toMap
      queryIds.flatMap { qid =>
        val q = vn(qid)
        def negs(n: Long): Double = -NaiveAnn.dot(q, vn(n))
        var cur = sh.entryId
        var lvl = sh.entryLevel
        while (lvl > 0) {
          val best = (cur +: adj.getOrElse((cur, lvl), Array.empty[Long]).toSeq)
            .map(n => (negs(n), n)).min
          if (best._2 == cur) lvl -= 1 else cur = best._2
        }
        var vis = Set(cur)
        var cand = Vector((negs(cur), cur))
        var res = Vector((negs(cur), cur))
        var halted = false
        while (!halted) {
          if (cand.isEmpty || (res.size >= efs && cand.head._1 > res.last._1)) {
            halted = true
          } else {
            val head = cand.head
            val unv = adj.getOrElse((head._2, 0), Array.empty[Long])
              .filterNot(vis.contains).map(n => (negs(n), n)).toVector
            vis ++= unv.map(_._2)
            cand = (cand.tail ++ unv).sorted
            res = (res ++ unv).sorted.take(efs)
          }
        }
        res.filter(_._2 != qid).take(k).map(t => (qid, t._2))
      }
    }
  }

  private def gateRows(dir: String): Seq[(Long, Int, Long, Double)] =
    graft.SparkEntry.queries("ann_hnsw_topk")(spark, dir)
      .select(col("query_id").cast("long"), col("rank"),
        col("neighbor_id").cast("long"), col("score"))
      .as[(Long, Int, Long, Double)].collect().toSeq

  private def diff(got: Seq[(Long, Int, Long, Double)],
      want: Seq[(Long, Int, Long, Double)]): Unit = {
    assert(want.nonEmpty, "reference produced no rows")
    assert(got.size == want.size, s"row counts differ: ${got.size} vs ${want.size}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"first divergence at row $i: got=$g want=$w")
    }
  }

  test("dump determinism: two rebuilds produce identical structure") {
    val emb = Tables.embeddings(spark, sf0001)
    val a = Ann.hnswIndexDump(emb, "vec_id", "embedding")
    val b = Ann.hnswIndexDump(emb, "vec_id", "embedding")
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.shard == y.shard && x.entryId == y.entryId &&
        x.entryLevel == y.entryLevel)
      assert(x.nodeLevels.toSeq == y.nodeLevels.toSeq)
      assert(x.adjacency.map { case (n, l, ns) => (n, l, ns.toSeq) }.toSeq ==
        y.adjacency.map { case (n, l, ns) => (n, l, ns.toSeq) }.toSeq)
    }
  }

  test("gate == batch search from the dump (sf0.001, gate config)") {
    val rows = corpus(sf0001)
    val dump = Ann.hnswIndexDump(Tables.embeddings(spark, sf0001),
      "vec_id", "embedding")
    val qids = rows.map(_._1).filter(_ < 20).sorted
    val cands = batchCandidates(dump, rows, qids, k = 5, ef = 64)
    diff(gateRows(sf0001), NaiveAnn.rerank(rows, cands, k = 5))
  }

  test("gate == batch search from the dump (sf0.01, gate config)") {
    val rows = corpus(sf001)
    val dump = Ann.hnswIndexDump(Tables.embeddings(spark, sf001),
      "vec_id", "embedding")
    val qids = rows.map(_._1).filter(_ < 20).sorted
    val cands = batchCandidates(dump, rows, qids, k = 5, ef = 64)
    diff(gateRows(sf001), NaiveAnn.rerank(rows, cands, k = 5))
  }

  /** ef = 12 against ~250-node shards: termination and the ef cap bind on
    * nearly every step, so this is where a hole in the batch-equivalence
    * argument would show (mutating the batch rule — e.g. skipping the
    * termination pop or trimming cand — diverges this test).
    */
  test("heap-faithful kernel == batch search under beam pressure (sf0.01)") {
    val rows = corpus(sf001)
    val emb = Tables.embeddings(spark, sf001)
    val got = Ann.hnswTopK(emb, "vec_id", "embedding", col("vec_id") < 20,
        k = 5, numShards = 2, m = 4, ef = 12)
      .select(col("query_id").cast("long"), col("rank"),
        col("neighbor_id").cast("long"), col("score"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    val dump = Ann.hnswIndexDump(emb, "vec_id", "embedding",
      numShards = 2, m = 4, ef = 12)
    val qids = rows.map(_._1).filter(_ < 20).sorted
    val cands = batchCandidates(dump, rows, qids, k = 5, ef = 12)
    diff(got, NaiveAnn.rerank(rows, cands, k = 5))
  }

  /** Randomized sweep of the batch-equivalence theorem: seeded synthetic
    * corpora across shard counts / m / ef (including ef far below shard
    * size, where termination and the cap bind constantly) must keep the
    * heap-faithful kernel and the batch replay row-for-row equal. The
    * hand-built cases pin specific paths; this sweeps their composition.
    */
  test("randomized corpora: heap-faithful kernel == batch replay across configs") {
    val rnd = new scala.util.Random(0x5eed14L)
    (1 to 3).foreach { round =>
      val n = 120 + rnd.nextInt(200)
      val dim = 8 + rnd.nextInt(12)
      val rows = (0L until n.toLong).map { i =>
        // ~15% mutated near-copies of earlier vectors: similarity ties
        // and tight margins around the beam's termination comparisons
        if (i > 10 && rnd.nextDouble() < 0.15) {
          val base = (rnd.nextInt(i.toInt)).toLong
          (i, Array.tabulate(dim)(j =>
            math.sin(base * 3.7 + j) + (if (rnd.nextBoolean()) 1e-9 else 0.0)))
        } else (i, Array.tabulate(dim)(j => math.sin(i * 3.7 + j * 1.3)))
      }
      val emb = rows.toDF("vec_id", "embedding")
      val shards = 1 + rnd.nextInt(4)
      val m = 3 + rnd.nextInt(4)
      val ef = 6 + rnd.nextInt(10)
      val k = 3
      val got = Ann.hnswTopK(emb, "vec_id", "embedding", col("vec_id") < 8,
          k, numShards = shards, m = m, ef = ef)
        .select(col("query_id").cast("long"), col("rank"),
          col("neighbor_id").cast("long"), col("score"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      val dump = Ann.hnswIndexDump(emb, "vec_id", "embedding",
        numShards = shards, m = m, ef = ef)
      val cands = batchCandidates(dump, rows, (0L until 8L), k, ef)
      val want = NaiveAnn.rerank(rows, cands, k)
      assert(got.size == want.size,
        s"round $round (n=$n dim=$dim shards=$shards m=$m ef=$ef): " +
          s"${got.size} vs ${want.size} rows")
      got.zip(want).foreach { case (g, w) =>
        assert(g == w, s"round $round (shards=$shards m=$m ef=$ef): $g vs $w")
      }
    }
  }

  /** Duplicate vectors force exact similarity ties (the id tie-break
    * paths) and a zero vector rides the un-normalized prep branch; the
    * gate's rerank drops it, so the batch side filters it the same way.
    */
  test("gate == batch search on a duplicate-heavy corpus with a zero vector") {
    val base = (0L until 48L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 7.0 + j * 3.0)))
    }
    val rows = base.map {
      case (i, _) if i % 5 == 0 && i > 0 => (i, base(1)._2.clone())
      case (i, _) if i == 47 => (i, Array.fill(8)(0.0))
      case (i, v) => (i, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val got = Ann.hnswTopK(emb, "vec_id", "embedding", col("vec_id") < 6,
        k = 3, numShards = 2, m = 4, ef = 8)
      .select(col("query_id").cast("long"), col("rank"),
        col("neighbor_id").cast("long"), col("score"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    val dump = Ann.hnswIndexDump(emb, "vec_id", "embedding",
      numShards = 2, m = 4, ef = 8)
    val qids = rows.map(_._1).filter(_ < 6).sorted
    val zeroNorm = rows.filter { case (_, v) => v.forall(_ == 0.0) }.map(_._1).toSet
    val cands = batchCandidates(dump, rows, qids, k = 3, ef = 8)
      .filterNot { case (q, n) => zeroNorm(q) || zeroNorm(n) }
    diff(got, NaiveAnn.rerank(rows, cands, k = 3))
  }
}
