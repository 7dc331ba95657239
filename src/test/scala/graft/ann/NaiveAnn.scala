package graft.ann

import scala.collection.mutable

/** From-first-principles, single-threaded reimplementations of the two
  * pinned ANN indexes, for the differential gates in
  * [[AnnDifferentialSpec]] — the `tx_bpe_encode` pattern (an independent
  * textbook implementation corroborates the production kernel) applied to
  * `ann_hnsw_topk` and `ann_ivfpq_topk`.
  *
  * These are written from the published algorithms (Malkov & Yashunin's
  * HNSW Algorithms 1–5; Jégou et al.'s IVFADC) plus the repo's documented
  * determinism pins (hash-derived levels, ascending-id insertion order and
  * mean folds, lower-id / lower-cell tie-breaks, id-mod Lloyd init) — NOT
  * from `Ann.scala`'s code shape: plain sorted immutable lists instead of
  * priority queues, Vectors instead of ArrayBuffers, a shared greedy-
  * descent helper instead of two inlined loops, per-step recomputation
  * instead of incremental state. A control-flow or data-structure bug in
  * either side (PQ ordering, early termination, backlink pruning, ADC
  * table indexing) diverges the outputs; only the agreed SPEC survives.
  */
object NaiveAnn {

  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** L2-normalize with the zero-vector guard the production prep documents
    * (zero norm → the vector itself).
    */
  def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(v, v))
    if (n == 0.0) v.clone() else v.map(_ / n)
  }

  /** floor(x·1e4 + 0.5)/1e4 — the gate family's score rounding. */
  def round4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  // ------------------------------------------------------------------ HNSW

  /** Textbook hierarchical navigable small world over one shard, with the
    * repo's determinism pins. Public knobs mirror the spec: `m` links per
    * node (2m at layer 0), `efC` construction beam width.
    */
  final class HnswIndex(m: Int, efC: Int) {
    private case class Node(id: Long, v: Array[Double], lvl: Int)
    private val nodes = mutable.ArrayBuffer.empty[Node]
    // adjacency: links(node)(level), append-ordered like the construction
    private val links = mutable.ArrayBuffer.empty[Array[Vector[Int]]]
    private var entry = -1

    /** The pinned level assignment: a multiplicative-hash uniform in (0,1)
      * through the standard exponential level rule, capped at 15.
      */
    private def levelOf(id: Long): Int = {
      val p = 1000000007L
      val h = ((id * 2654435761L + 0x9e3779b9L) % p + p) % p
      val u = (h.toDouble + 1.0) / 1000000008.0
      math.min(15, math.floor(-math.log(u) * (1.0 / math.log(m.toDouble))).toInt)
    }

    /** Greedy hill-climb at one level. The sweep snapshot rule is part of
      * the spec: each sweep scans the neighbor list of the node that was
      * best at sweep START, in list order, comparing against the running
      * best (which may update mid-sweep); ties go to the lower id.
      */
    private def greedy(q: Array[Double], from: Int, level: Int): Int = {
      var best = from
      var bestS = dot(q, nodes(best).v)
      var improved = true
      while (improved) {
        improved = false
        val sweep = links(best)(level)
        for (n <- sweep) {
          val s = dot(q, nodes(n).v)
          if (s > bestS || (s == bestS && nodes(n).id < nodes(best).id)) {
            best = n; bestS = s; improved = true
          }
        }
      }
      best
    }

    /** Beam search at one level: best-first candidate list, result list
      * capped at `ef` (worst dropped), both totally ordered by
      * (−similarity, id). Termination when the best remaining candidate's
      * similarity is strictly below the current worst result (and the
      * beam is full); acceptance when the result beam has room OR the
      * neighbor beats the current worst on (similarity, then lower id).
      * Returns the beam best-first.
      */
    private def searchLayer(q: Array[Double], ep: Int, ef: Int,
        level: Int): List[(Double, Int)] = {
      def key(t: (Double, Int)): (Double, Long) = (-t._1, nodes(t._2).id)
      def ins(xs: List[(Double, Int)], x: (Double, Int)): List[(Double, Int)] = {
        val (before, after) = xs.span(e =>
          implicitly[Ordering[(Double, Long)]].lt(key(e), key(x)))
        before ::: (x :: after)
      }
      val visited = mutable.HashSet(ep)
      val e0 = (dot(q, nodes(ep).v), ep)
      var cand = List(e0)
      var res = List(e0)
      while (cand.nonEmpty) {
        val c = cand.head
        cand = cand.tail
        if (c._1 < res.last._1 && res.size >= ef) cand = Nil
        else {
          for (n <- links(c._2)(level); if visited.add(n)) {
            val s = dot(q, nodes(n).v)
            val worst = res.last
            if (res.size < ef || s > worst._1 ||
                (s == worst._1 && nodes(n).id < nodes(worst._2).id)) {
              cand = ins(cand, (s, n))
              res = ins(res, (s, n))
              if (res.size > ef) res = res.init
            }
          }
        }
      }
      res
    }

    def insert(id: Long, v: Array[Double]): Unit = {
      val node = nodes.length
      val lvl = levelOf(id)
      nodes += Node(id, v, lvl)
      links += Array.fill(lvl + 1)(Vector.empty[Int])
      if (entry < 0) { entry = node; return }

      var ep = entry
      var l = nodes(entry).lvl
      while (l > lvl) { ep = greedy(v, ep, l); l -= 1 }

      l = math.min(nodes(entry).lvl, lvl)
      while (l >= 0) {
        val found = searchLayer(v, ep, efC, l)
        val cap = if (l == 0) 2 * m else m
        for ((_, n) <- found.take(m)) {
          links(node)(l) = links(node)(l) :+ n
          links(n)(l) = links(n)(l) :+ node
          if (links(n)(l).length > cap) {
            links(n)(l) = links(n)(l)
              .map(x => (dot(nodes(n).v, nodes(x).v), x))
              .sortBy { case (s, x) => (-s, nodes(x).id) }
              .take(cap).map(_._2)
          }
        }
        ep = found.head._2
        l -= 1
      }
      if (lvl > nodes(entry).lvl) entry = node
    }

    /** Shard-local top-k (id, similarity) for a query, self excluded. */
    def search(q: Array[Double], selfId: Long, k: Int,
        ef: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Seq.empty
      var ep = entry
      var l = nodes(entry).lvl
      while (l > 0) { ep = greedy(q, ep, l); l -= 1 }
      searchLayer(q, ep, math.max(ef, k + 1), 0).iterator
        .map { case (s, n) => (nodes(n).id, s) }
        .filter(_._1 != selfId).take(k).toSeq
    }
  }

  /** The full `hnswTopK` pipeline, naively: shard by id mod numShards,
    * ascending-id insert per shard, every query probes every shard, exact
    * cosine re-rank of the candidate union, (−cos, id) top-k per query.
    * Rows: (query_id, rank, neighbor_id, round4 score), query/rank order.
    */
  def hnswTopK(rows: Seq[(Long, Array[Double])], queryIds: Set[Long], k: Int,
      numShards: Int = 8, m: Int = 8, ef: Int = 64): Seq[(Long, Int, Long, Double)] = {
    val normed = rows.map { case (id, v) => (id, normalize(v)) }
    val queries = normed.filter(q => queryIds(q._1)).sortBy(_._1)
    val candidates = mutable.ArrayBuffer.empty[(Long, Long)]
    normed.groupBy { case (id, _) => ((id % numShards) + numShards) % numShards }
      .toSeq.sortBy(_._1)
      .foreach { case (_, shard) =>
        val g = new HnswIndex(m, math.max(ef, 2 * m))
        shard.sortBy(_._1).foreach { case (id, vn) => g.insert(id, vn) }
        for ((qid, qv) <- queries; (nid, _) <- g.search(qv, qid, k, ef))
          candidates += ((qid, nid))
      }
    rerank(rows, candidates.toSeq, k)
  }

  /** Exact cosine re-rank shared by both pipelines: raw double vectors,
    * cos = dot/(‖q‖·‖n‖), (−cos, neighbor) top-k per query, round4.
    */
  def rerank(rows: Seq[(Long, Array[Double])], candidates: Seq[(Long, Long)],
      k: Int): Seq[(Long, Int, Long, Double)] = {
    val byId = rows.toMap
    val nrm = rows.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    candidates.distinct.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (qid, cs) =>
        cs.map { case (_, nid) =>
          (nid, dot(byId(qid), byId(nid)) / (nrm(qid) * nrm(nid)))
        }.sortBy { case (nid, cos) => (-cos, nid) }
          .take(k).zipWithIndex
          .map { case ((nid, cos), i) => (qid, i + 1, nid, round4(cos)) }
    }
  }

  // ---------------------------------------------------------------- IVF-PQ

  /** Ascending-id mean fold: members of each group summed in id order,
    * divided once; groups with no members keep their previous center.
    */
  private def groupMeans(assigned: Seq[(Int, Long, Array[Double])],
      prev: Array[Array[Double]]): Array[Array[Double]] = {
    val computed = assigned.groupBy(_._1).map { case (g, rows0) =>
      val rows = rows0.sortBy(_._2)
      val dim = rows.head._3.length
      val acc = new Array[Double](dim)
      for (r <- rows) { var i = 0; while (i < dim) { acc(i) += r._3(i); i += 1 } }
      var i = 0; while (i < dim) { acc(i) /= rows.length; i += 1 }
      (g, acc)
    }
    Array.tabulate(prev.length)(c => computed.getOrElse(c, prev(c)))
  }

  /** argmax over centroid dots, strict-greater ascending scan (ties to the
    * lower cell).
    */
  def nearestByDot(vn: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestS = Double.NegativeInfinity
    for (c <- cents.indices) {
      val s = dot(vn, cents(c))
      if (s > bestS) { bestS = s; best = c }
    }
    best
  }

  /** argmin over squared L2 distances, strict-less ascending scan. */
  private def nearestByL2(x: Array[Double], book: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.PositiveInfinity
    for (c <- book.indices) {
      var d = 0.0
      for (i <- book(c).indices) { val t = x(i) - book(c)(i); d += t * t }
      if (d < bestD) { bestD = d; best = c }
    }
    best
  }

  /** Deterministic Lloyd: id-mod init, `iters` reassign+mean rounds. */
  def lloydByDot(sample: Seq[(Long, Array[Double])], kCells: Int,
      iters: Int): Array[Array[Double]] = {
    var cents = groupMeans(
      sample.map { case (id, vn) => ((((id % kCells) + kCells) % kCells).toInt, id, vn) },
      Array.fill(kCells)(Array.empty[Double]))
    for (_ <- 1 to iters) {
      cents = groupMeans(
        sample.map { case (id, vn) => (nearestByDot(vn, cents), id, vn) }, cents)
    }
    cents
  }

  /** The full `ivfPqTopK` pipeline, naively. `rows` must fit the training
    * cap (the caller asserts), so the training sample is simply every row
    * in ascending-id order.
    */
  def ivfPqTopK(rows: Seq[(Long, Array[Double])], queryIds: Set[Long], k: Int,
      numCells: Int = 16, nProbe: Int = 4, m: Int = 8, ks: Int = 16,
      candidateFactor: Int = 8, lloydIters: Int = 2): Seq[(Long, Int, Long, Double)] = {
    val normed = rows.map { case (id, v) => (id, normalize(v)) }.sortBy(_._1)
    val dim = normed.head._2.length
    require(dim % m == 0)
    val subDim = dim / m

    // coarse quantizer over the (cap-exempt) full sample
    val cents = lloydByDot(normed, numCells, lloydIters)

    def residual(vn: Array[Double]): Array[Double] = {
      val c = cents(nearestByDot(vn, cents))
      Array.tabulate(vn.length)(i => vn(i) - c(i))
    }

    // per-subspace residual codebooks: zero-vector init centers, id-mod
    // init assignment, same mean-fold rule
    val codebooks: IndexedSeq[Array[Array[Double]]] = (0 until m).map { sub =>
      val items = normed.map { case (id, vn) =>
        (id, residual(vn).slice(sub * subDim, (sub + 1) * subDim))
      }
      var book = groupMeans(
        items.map { case (id, r) => ((((id % ks) + ks) % ks).toInt, id, r) },
        Array.fill(ks)(new Array[Double](subDim)))
      for (_ <- 1 to lloydIters) {
        book = groupMeans(
          items.map { case (id, r) => (nearestByL2(r, book), id, r) }, book)
      }
      book
    }

    // compressed index: (cell, id, m one-byte codes)
    val index = normed.map { case (id, vn) =>
      val cell = nearestByDot(vn, cents)
      val r = residual(vn)
      val code = Array.tabulate(m)(sub =>
        nearestByL2(r.slice(sub * subDim, (sub + 1) * subDim), codebooks(sub)))
      (cell, id, code)
    }
    val byCell = index.groupBy(_._1)

    // ADC probe per query: top-nProbe cells by centroid dot (tie lower
    // cell), approx = centroid dot + Σ_sub lut(sub)(code), global
    // (−approx, id) cut at candidateFactor·k, then exact re-rank
    val candidates = normed.filter(q => queryIds(q._1)).flatMap { case (qid, qvn) =>
      val lut = Array.tabulate(m, ks) { (sub, j) =>
        var s = 0.0
        for (i <- 0 until subDim) s += qvn(sub * subDim + i) * codebooks(sub)(j)(i)
        s
      }
      val probed = cents.indices
        .map(c => (c, dot(qvn, cents(c))))
        .sortBy { case (c, s) => (-s, c) }
        .take(nProbe)
      probed.flatMap { case (cell, celldot) =>
        byCell.getOrElse(cell, Seq.empty).collect {
          case (_, nid, code) if nid != qid =>
            var s = celldot
            for (sub <- 0 until m) s += lut(sub)(code(sub))
            (qid, nid, s)
        }
      }.sortBy { case (_, nid, s) => (-s, nid) }
        .take(k * candidateFactor)
        .map { case (q, n, _) => (q, n) }
    }
    rerank(rows, candidates, k)
  }
}
