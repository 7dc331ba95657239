package graft.ann

import org.scalatest.funsuite.AnyFunSuite

/** r19: the primitive-structure HNSW rewrite (BeamHeap + stamped visited
  * marks + primitive columns) must be BIT-IDENTICAL to the r18 boxed form
  * — same graphs (dump), same frozen search results — because six gates
  * hash the graph artifact through the DuckDB oracle and the standing
  * index pins insert/compact to fresh-build equality. This spec carries a
  * VERBATIM copy of the r18 boxed implementation ([[LegacyHnsw]]) and
  * pins equality on seeded corpora that exercise level spread, backlink
  * pruning overflow, and duplicate-score ties (quantized vectors force
  * equal dots, so the lower-id tie-breaks are actually taken).
  */
class HnswPrimitiveEquivalenceSpec extends AnyFunSuite {

  private def corpus(n: Int, dim: Int, seed: Long, quant: Boolean): Array[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(n) { i =>
      val raw = Array.fill(dim)(
        if (quant) (rnd.nextInt(3) - 1).toDouble else rnd.nextGaussian())
      val norm = math.sqrt(raw.map(x => x * x).sum)
      val v = if (norm == 0.0) { raw(0) = 1.0; raw } else raw.map(_ / norm)
      // non-contiguous ids so id-ordering != node-ordering assumptions fail loud
      (i.toLong * 7 + (i % 3), v)
    }
  }

  private def assertSame(rows: Array[(Long, Array[Double])], m: Int, ef: Int): Unit = {
    val sorted = rows.sortBy(_._1)
    val g = new Ann.HnswGraph(m, math.max(ef, 2 * m))
    val lg = new LegacyHnsw(m, math.max(ef, 2 * m))
    sorted.foreach { case (id, v) => g.insert(id, v); lg.insert(id, v) }
    // graph equality via the oracle-artifact dump
    val d = g.dump(0); val ld = lg.dump(0)
    assert(d.entryId == ld.entryId && d.entryLevel == ld.entryLevel)
    assert(d.nodeLevels.toSeq == ld.nodeLevels.toSeq)
    assert(d.adjacency.length == ld.adjacency.length)
    d.adjacency.zip(ld.adjacency).foreach { case ((id1, l1, ns1), (id2, l2, ns2)) =>
      assert(id1 == id2 && l1 == l2, s"adjacency row order diverged at $id1/$id2")
      assert(ns1.toSeq == ns2.toSeq, s"neighbors diverged for id=$id1 level=$l1")
    }
    // frozen-search equality across queries incl. self-exclusion
    val fs = g.freeze(-1L, -1)
    rows.take(40).foreach { case (qid, qv) =>
      val got = Ann.searchFrozen(fs, qv, qid, 10, ef)
      val want = lg.searchBoxed(qv, qid, 10, ef)
      assert(got == want, s"searchFrozen diverged for query $qid")
    }
  }

  test("gaussian corpus: graphs and searches bit-identical to the boxed r18 form") {
    assertSame(corpus(600, 16, seed = 42L, quant = false), m = 8, ef = 32)
  }

  test("quantized corpus (massive dot ties): tie-breaks identical") {
    assertSame(corpus(500, 8, seed = 7L, quant = true), m = 4, ef = 16)
  }

  test("tiny and degenerate shards: single node, two nodes") {
    assertSame(corpus(1, 8, 3L, quant = false), m = 4, ef = 8)
    assertSame(corpus(2, 8, 4L, quant = false), m = 4, ef = 8)
  }
}

/** Verbatim r18 boxed HnswGraph (ArrayBuffer columns, HashSet visited,
  * PriorityQueue[(Double, Int)] beams) — the reference the primitive
  * rewrite is pinned against. searchBoxed is the old searchFrozen beam
  * run directly on the mutable graph (same orderings).
  */
final class LegacyHnsw(m: Int, efConstruction: Int) {
  private val mL = 1.0 / math.log(m.toDouble)
  private val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
  private val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
  private val levels = scala.collection.mutable.ArrayBuffer.empty[Int]
  private val neighbors =
    scala.collection.mutable.ArrayBuffer.empty[Array[scala.collection.mutable.ArrayBuffer[Int]]]
  private var entry = -1

  private def uniformOf(id: Long): Double = {
    val h = ((id * 2654435761L + 0x9e3779b9L) % 1000000007L + 1000000007L) % 1000000007L
    (h.toDouble + 1.0) / 1000000008.0
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def searchLayer(
      q: Array[Double], ep: Int, ef: Int, level: Int): Seq[(Double, Int)] = {
    val visited = scala.collection.mutable.HashSet(ep)
    implicit val ord: Ordering[(Double, Int)] =
      Ordering.by { case (s, n) => (-s, ids(n)) }
    val cand = scala.collection.mutable.PriorityQueue((dot(q, vecs(ep)), ep))(ord.reverse)
    val res = scala.collection.mutable.PriorityQueue((dot(q, vecs(ep)), ep))(ord)
    while (cand.nonEmpty) {
      val (cs, c) = cand.dequeue()
      val worst = res.head._1
      if (cs < worst && res.size >= ef) { cand.clear() }
      else {
        val ns = neighbors(c)(level)
        var i = 0
        while (i < ns.length) {
          val n = ns(i)
          if (visited.add(n)) {
            val s = dot(q, vecs(n))
            if (res.size < ef || s > res.head._1 ||
              (s == res.head._1 && ids(n) < ids(res.head._2))) {
              cand.enqueue((s, n))
              res.enqueue((s, n))
              if (res.size > ef) res.dequeue()
            }
          }
          i += 1
        }
      }
    }
    res.toSeq.sortBy { case (s, n) => (-s, ids(n)) }
  }

  def insert(id: Long, v: Array[Double]): Unit = {
    val node = ids.length
    val lvl = math.min(15, math.floor(-math.log(uniformOf(id)) * mL).toInt)
    ids += id; vecs += v; levels += lvl
    neighbors += Array.fill(lvl + 1)(scala.collection.mutable.ArrayBuffer.empty[Int])
    if (entry < 0) { entry = node; return }
    var ep = entry
    val topLvl = levels(entry)
    var l = topLvl
    while (l > lvl) {
      var improved = true
      var best = ep; var bestS = dot(v, vecs(ep))
      while (improved) {
        improved = false
        val ns = neighbors(best)(l)
        var i = 0
        while (i < ns.length) {
          val s = dot(v, vecs(ns(i)))
          if (s > bestS || (s == bestS && ids(ns(i)) < ids(best))) {
            best = ns(i); bestS = s; improved = true
          }
          i += 1
        }
      }
      ep = best
      l -= 1
    }
    l = math.min(topLvl, lvl)
    while (l >= 0) {
      val found = searchLayer(v, ep, efConstruction, l)
      val cap = if (l == 0) 2 * m else m
      val selected = found.take(m)
      selected.foreach { case (_, n) =>
        neighbors(node)(l) += n
        val back = neighbors(n)(l)
        back += node
        if (back.length > cap) {
          val pruned = back
            .map(x => (dot(vecs(n), vecs(x)), x))
            .sortBy { case (s, x) => (-s, ids(x)) }
            .take(cap).map(_._2)
          back.clear(); back ++= pruned
        }
      }
      ep = found.head._2
      l -= 1
    }
    if (lvl > levels(entry)) entry = node
  }

  def dump(shard: Int): Ann.HnswShardDump = Ann.HnswShardDump(
    shard,
    if (entry < 0) -1L else ids(entry),
    if (entry < 0) -1 else levels(entry),
    Array.tabulate(ids.length)(i => (ids(i), levels(i))),
    (for { i <- ids.indices; l <- 0 to levels(i) } yield
      (ids(i), l, neighbors(i)(l).map(ids(_)).toArray)).toArray)

  /** The old searchFrozen (greedy descent + boxed level-0 beam) over the
    * mutable adjacency — orderings identical to the r18 frozen search.
    */
  def searchBoxed(q: Array[Double], selfId: Long, k: Int, ef: Int): Seq[(Long, Double)] = {
    if (entry < 0) return Seq.empty
    var ep = entry
    var l = levels(entry)
    while (l > 0) {
      var improved = true
      var best = ep; var bestS = dot(q, vecs(ep))
      while (improved) {
        improved = false
        val ns = neighbors(best)(l)
        var i = 0
        while (i < ns.length) {
          val n = ns(i)
          val s = dot(q, vecs(n))
          if (s > bestS || (s == bestS && ids(n) < ids(best))) {
            best = n; bestS = s; improved = true
          }
          i += 1
        }
      }
      ep = best
      l -= 1
    }
    val efq = math.max(ef, k + 1)
    val visited = scala.collection.mutable.HashSet(ep)
    implicit val ord: Ordering[(Double, Int)] =
      Ordering.by { case (s, n) => (-s, ids(n)) }
    val cand = scala.collection.mutable.PriorityQueue((dot(q, vecs(ep)), ep))(ord.reverse)
    val res = scala.collection.mutable.PriorityQueue((dot(q, vecs(ep)), ep))(ord)
    while (cand.nonEmpty) {
      val (cs, c) = cand.dequeue()
      val worst = res.head._1
      if (cs < worst && res.size >= efq) { cand.clear() }
      else {
        val ns = neighbors(c)(0)
        var i = 0
        while (i < ns.length) {
          val n = ns(i)
          if (visited.add(n)) {
            val s = dot(q, vecs(n))
            if (res.size < efq || s > res.head._1 ||
              (s == res.head._1 && ids(n) < ids(res.head._2))) {
              cand.enqueue((s, n))
              res.enqueue((s, n))
              if (res.size > efq) res.dequeue()
            }
          }
          i += 1
        }
      }
    }
    res.toSeq.sortBy { case (s, n) => (-s, ids(n)) }
      .iterator.map { case (s, n) => (ids(n), s) }
      .filter(_._1 != selfId).take(k).toSeq
  }
}
