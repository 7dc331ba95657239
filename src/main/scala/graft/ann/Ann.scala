package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  *
  *   - brute-force cosine top-k — the exactness baseline; queries broadcast
  *     against the corpus, one shuffle for the per-query rank;
  *   - random-hyperplane LSH — the scale path: 1-bit-per-plane signature,
  *     equal-signature bucketing turns the all-pairs scan into an
  *     equi-join; recall is tested against the brute-force baseline.
  *
  * All math in double with a left-to-right fold so results are
  * bit-reproducible against the DuckDB oracle (float sums are
  * order-sensitive; a fixed fold order removes the variance).
  */
object Ann {

  /** Left-to-right dot product as the native codegen expression
    * [[graft.functions.DoubleArrayDot]]. The ladder, measured: a Catalyst
    * higher-order `aggregate` evaluates interpreted per element (~10×
    * slower on the 12M-pair brute scan); a `Seq[Double]` UDF compiles the
    * loop but boxes both arrays per pair AND splits the surrounding stage
    * out of whole-stage codegen (the dd_ppjoin r10 profile); the native
    * expression reads `ArrayData.getDouble` in generated code with the
    * same strict fold order, so oracle doubles still match bit-for-bit.
    * Resolved by registry name — every Ann entry point that sees a
    * DataFrame calls [[kernels]] on its session first.
    */
  private def dotNative(a: Column, b: Column): Column =
    call_function("double_array_dot_native", a, b)

  /** Idempotent kernel-function registration on the session owning `df`. */
  private def kernels(df: DataFrame): DataFrame = {
    graft.functions.GraftExtensions.register(df.sparkSession)
    df
  }

  /** Cosine similarity of two array<double> columns (fold left-to-right).
    * Deliberately UDF-backed, NOT [[dotNative]]: this is the one public
    * Column builder with no session in scope, and a registry-resolved
    * function here would make previously-working standalone calls fail
    * analysis on sessions that never touched an Ann entry point. The hot
    * pair paths all go through the DataFrame entry points, which use the
    * native kernel.
    */
  def cosine(a: Column, b: Column): Column = {
    val dotUdf = udf { (x: Seq[Double], y: Seq[Double]) =>
      var s = 0.0
      var i = 0
      val n = x.length
      while (i < n) { s += x(i) * y(i); i += 1 }
      s
    }
    dotUdf(a, b) / (sqrt(dotUdf(a, a)) * sqrt(dotUdf(b, b)))
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Brute-force cosine top-k: for each query vector (filtered by
    * `queryPred`), the k nearest corpus vectors (self excluded), ranked by
    * similarity desc then neighbor id. Output: (query_id, rank,
    * neighbor_id, score rounded 4dp).
    */
  /** (id, vec, norm) with the norm computed ONCE per vector — the pairwise
    * stage then evaluates a single dot product per pair instead of three
    * fold expressions (norms recomputed per pair are the classic brute-ANN
    * time sink). The cosine arithmetic `dot/(na*nb)` is unchanged, so the
    * oracle's doubles still match bit-for-bit.
    */
  private def withNorm(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame =
    kernels(embeddings).select(
        col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
        sqrt(dotNative(asDouble(col(vecCol)), asDouble(col(vecCol)))).as("nrm"))
      // zero-norm vectors are EXCLUDED from cosine ranking (r13 review):
      // cosine is undefined for them, and without this guard 0/0 = NaN —
      // which BOTH Spark and DuckDB order above every real value — would
      // silently rank a zero (padding) embedding as every query's #1
      // neighbor. The ann oracles carry the matching norm guards.
      .where(col("nrm") > 0)

  private def dotCol(a: Column, b: Column): Column = dotNative(a, b)

  /** Exact re-rank tail shared by every candidate-generating top-k path
    * (IVF-PQ, HNSW, LSH, multi-probe LSH): join true vectors + norms back
    * for the surviving (query_id, neighbor_id) candidates only, score
    * with the identical arithmetic to [[cosineTopK]], keep the best `k`
    * per query. ONE implementation (r13 review: four verbatim copies)
    * so the scoring/tie-break/rounding contract cannot drift per path.
    */
  private def exactRerank(
      candidates: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val base = withNorm(embeddings, idCol, vecCol)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    candidates
      .join(base.select(col("id").as("query_id"), col("v").as("qvec"), col("nrm").as("qn")),
        Seq("query_id"))
      .join(base.select(col("id").as("neighbor_id"), col("v").as("nvec"), col("nrm").as("nn")),
        Seq("neighbor_id"))
      .withColumn("cos", dotCol(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round4(col("cos")).as("score"))
      .orderBy("query_id", "rank")
  }

  def cosineTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int): DataFrame = {
    val corpus = withNorm(embeddings, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("v").as("nvec"), col("nrm").as("nn"))
    val queries = withNorm(embeddings.where(queryPred), idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qvec"), col("nrm").as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queries).crossJoin(corpus)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotCol(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round4(col("cos")).as("score"))
      .orderBy("query_id", "rank")
  }

  /** Tie-proof 4dp rounding: floor(x*1e4 + 0.5)/1e4 — the same IEEE op
    * sequence the oracle SQL spells out, so both engines produce the
    * identical double even when x sits a ulp from a decimal boundary
    * (where Spark's decimal-exact HALF_UP and DuckDB's double ROUND
    * disagree).
    */
  private def round4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0

  /** Hard-negative mining for contrastive / embedding-model training:
    * for each query, the top-k corpus vectors whose cosine falls in
    * [lo, hi) — similar enough to be informative negatives, but BELOW the
    * near-duplicate band (cosine >= hi is a likely positive/duplicate and
    * would poison the negative set; cosine < lo is trivially easy).
    * Ranked (cosine DESC, neighbor_id) — hardest negatives first. Output:
    * (query_id, rank, neighbor_id, score 4dp), the [[cosineTopK]] shape.
    *
    * Scale shape: identical to [[cosineTopK]] — queries broadcast, the
    * band predicate and scoring run inside the scan-side codegen stage,
    * only (query, neighbor, cos) survivors reach the per-query rank. For
    * corpus-wide mining (every doc a query) compose the banded filter
    * with [[cosinePairsIvf]]'s bucketed candidate rule instead — the
    * per-query broadcast contract here is the [[hnswTopK]] one: the query
    * SET rides a broadcast (queries × dim × 8 bytes on the driver), so it
    * must be small — enforced by `maxQueries` (fail-fast, no partial
    * work) rather than assumed.
    */
  def hardNegatives(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      lo: Double,
      hi: Double,
      maxQueries: Int = 4096): DataFrame = {
    require(lo < hi, s"hardNegatives: empty band [$lo, $hi)")
    val corpus = withNorm(embeddings, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("v").as("nvec"), col("nrm").as("nn"))
    val queries = withNorm(embeddings.where(queryPred), idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qvec"), col("nrm").as("qn"))
    // the broadcast below materializes the full query set on the driver —
    // enforce the bounded-collect contract the way hnswTopK does (one
    // cheap limit(n+1) count over ids only; no partial work on failure)
    val nq = queries.select(col("query_id")).limit(maxQueries + 1).count()
    require(nq <= maxQueries,
      s"hardNegatives: queryPred matched more than maxQueries=$maxQueries " +
        "rows; the banded mining probe broadcasts the full query set — " +
        "narrow the predicate, chunk the queries, or raise maxQueries " +
        "deliberately (driver memory = queries x dim x 8 bytes). For " +
        "corpus-wide mining compose the band filter with cosinePairsIvf.")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queries).crossJoin(corpus)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotCol(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
      .where(col("cos") >= lo && col("cos") < hi)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round4(col("cos")).as("score"))
      .orderBy("query_id", "rank")
  }

  /** All pairs (a<b) with cosine >= threshold — embedding near-dup dedup.
    *
    * Exact all-pairs is inherently O(n²) work; the scalable shape is to
    * DISTRIBUTE that work with bounded memory, not to collect the corpus
    * on the driver. Triangle block partitioning: each vector lands in
    * block `id mod B`; the upper-triangular cell grid {(bi,bj) : bi<=bj}
    * partitions the O(n²) sweep — every unordered pair meets in exactly
    * one cell. Each row is replicated to the B cells its block touches
    * (ONE shuffle of n×B rows), then one task per cell materializes its
    * two blocks as primitive double arrays and runs the pair sweep as a
    * compiled tight loop — no per-pair UDF invocation, no wide join rows
    * carrying vectors through an Exchange. Per-task memory is two blocks
    * — tune `numBlocks` so 2·n/B·dim doubles fit an executor; at larger
    * corpora raise B (cells grow as B², tasks stay bounded). For corpora
    * where even distributed O(n²) is too much compute,
    * [[hyperplaneSignature]]-bucketed candidates (the [[lshTopK]] shape)
    * are the approximate fallback.
    *
    * Arithmetic matches the DuckDB oracle exactly: left-to-right dot
    * fold, cos = dot/(‖a‖·‖b‖), floor-form 4dp rounding (see [[round4]]).
    */
  def cosinePairs(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numBlocks: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cellOf = Array.tabulate(numBlocks, numBlocks)((i, j) => i * numBlocks + j)
    embeddings.select(
        col(idCol).cast("long").as("id"), asDouble(col(vecCol)).as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        // norm once per vector, BEFORE replication
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val nrm = math.sqrt(s)
        // floorMod, not Scala remainder (r13 review): a negative id must
        // land in a valid block like every other sharding site in the file
        val b = (((id % numBlocks) + numBlocks) % numBlocks).toInt
        // this block is the LEFT side of cells (b, j>=b) and the RIGHT
        // side of cells (i<b, b) — strict split so (b,b) emits once
        val out = new Array[(Int, Boolean, Long, Double, Array[Double])](numBlocks)
        var j = b; var k = 0
        while (j < numBlocks) { out(k) = (cellOf(b)(j), true, id, nrm, v); j += 1; k += 1 }
        var bi = 0
        while (bi < b) { out(k) = (cellOf(bi)(b), false, id, nrm, v); bi += 1; k += 1 }
        out
      }
      .groupByKey(_._1)
      .flatMapGroups { (cell: Int, it: Iterator[(Int, Boolean, Long, Double, Array[Double])]) =>
        val diagonal = cell / numBlocks == cell % numBlocks
        val ls = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Double])]
        val rs = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Double])]
        it.foreach { case (_, isL, id, nrm, v) =>
          if (isL) ls += ((id, nrm, v)) else rs += ((id, nrm, v))
        }
        val left = ls.toArray
        val right = if (diagonal) left else rs.toArray
        val dim = if (left.nonEmpty) left(0)._3.length else 0
        val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < left.length) {
          val (ida, na, va) = left(i)
          var j = if (diagonal) i + 1 else 0
          while (j < right.length) {
            val (idb, nb, vb) = right(j)
            var dot = 0.0; var d = 0
            while (d < dim) { dot += va(d) * vb(d); d += 1 }
            val cos = dot / (na * nb)
            if (cos >= threshold) {
              val a = math.min(ida, idb); val b = math.max(ida, idb)
              // same floor-form rounding as the oracle (see round4)
              acc += ((a, b, math.floor(cos * 10000.0 + 0.5) / 10000.0))
            }
            j += 1
          }
          i += 1
        }
        acc.iterator
      }
      .toDF("a", "b", "score")
      .orderBy("a", "b")
  }

  /** IVF-bucketed cosine near-dup pairs — the 100 TB scale path for
    * [[cosinePairs]]'s O(n²) triangle sweep (the embedding-modality
    * analogue of the text dedup's routed tier): vectors bucket into the
    * deterministic IVF coarse cells, each assigned to its top `nProbe`
    * cells (multi-assignment is the recall lever — a true pair is missed
    * only when the two vectors share NONE of their probed cells), pair
    * candidates are generated per cell by an in-task sweep — work Σ c²
    * over cell sizes instead of n² — and verified with the EXACT cosine
    * arithmetic of the brute tier, so a bucketing false positive can
    * never reach the output (every emitted pair truly clears the
    * threshold; only recall is approximate). Raise `numCells` ~ √n as
    * the corpus grows to keep cells bounded; the replication factor is
    * exactly `nProbe`, one shuffle of (cell, vector) rows.
    *
    * Deterministic end-to-end (bounded trainer, lower-cell ties), so the
    * gate's oracle embeds the trained centroids and DuckDB replicates
    * the FULL candidate rule — hash-equality holds INDEPENDENT of
    * recall; recall vs the brute relation is measured separately
    * (AnnIvfPairsSpec floors). Zero-norm vectors are excluded up front
    * (cosine undefined; the oracle's n > 0 guards match).
    */
  def cosinePairsIvfWithCentroids(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nProbe: Int,
      cents: Array[Array[Double]],
      maxCellMembers: Int = 1 << 16): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centsB = spark.sparkContext.broadcast(cents)
    ivfPrep(embeddings, idCol, vecCol)
      .filter(_._3 > 0)
      .flatMap { case (id, v, n, vn) =>
        val cs = centsB.value
        val scored = Array.tabulate(cs.length) { c =>
          val ct = cs(c)
          var dot = 0.0; var i = 0
          while (i < ct.length) { dot += vn(i) * ct(i); i += 1 }
          (c, dot)
        }
        scored.sortBy { case (c, dot) => (-dot, c) }.take(nProbe)
          .map { case (c, _) => (c, id, n, v) }
      }
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        // in-task sweep over one cell: all (i, j>i) member pairs, exact
        // verify inline (dot folds ascending — bit-identical either
        // orientation, so the emitted (min, max, score) row matches the
        // oracle's lower-id-first computation exactly)
        val ms = it.map { case (_, id, n, v) => (id, n, v) }.toArray
        // the streaming twin's cellSweep tripwire, batch side: a hot cell
        // (one dominant direction) does O(members²) work and holds its
        // vectors in one task — fail loud with the remedy instead of
        // OOMing silently (the same requireBounded contract as the text
        // dedup tiers)
        require(ms.length <= maxCellMembers,
          s"cosinePairsIvf cell holds ${ms.length} members " +
            s"(> maxCellMembers=$maxCellMembers): raise numCells (~sqrt(n) " +
            "at scale) so cells stay bounded, or raise maxCellMembers " +
            "deliberately")
        val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < ms.length) {
          val (ida, na, va) = ms(i)
          var j = i + 1
          while (j < ms.length) {
            val (idb, nb, vb) = ms(j)
            var dot = 0.0; var d = 0
            while (d < va.length) { dot += va(d) * vb(d); d += 1 }
            val cos = dot / (na * nb)
            if (cos >= threshold) {
              val a = math.min(ida, idb); val b = math.max(ida, idb)
              acc += ((a, b, math.floor(cos * 10000.0 + 0.5) / 10000.0))
            }
            j += 1
          }
          i += 1
        }
        acc.iterator
      }
      .toDF("a", "b", "score")
      // a pair meeting in several shared probed cells emits once per cell
      .dropDuplicates("a", "b")
      .orderBy("a", "b")
  }

  /** Incremental IVF-bucketed cosine near-dup pairs — exactly the
    * [[cosinePairsIvfWithCentroids]] pairs that TOUCH a new-batch vector
    * (`isNew`), computed without pairing old vectors among themselves: the
    * per-cell sweep runs new×old + the new×new triangle, so per-cell work
    * is |new|·|members| instead of |members|² — the steady-state ingest
    * shape ([[graft.text.Dedup.jaccardPairsIncremental]]'s contract on the
    * embedding modality; old×old pairs live in yesterday's materialized
    * pair table). Same exact verify, same emission dedup: output equals
    * the full relation restricted to touching-new pairs (spec-pinned).
    */
  def cosinePairsIvfIncrementalWithCentroids(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      isNew: Column,
      threshold: Double,
      nProbe: Int,
      cents: Array[Array[Double]],
      maxCellMembers: Int = 1 << 16): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centsB = spark.sparkContext.broadcast(cents)
    embeddings.select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v"), isNew.cast("boolean").as("nw"))
      .as[(Long, Array[Double], Boolean)]
      .flatMap { case (id, v, nw) =>
        // the ivfPrep norm/normalize fold with the isNew flag carried
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val n = math.sqrt(s)
        if (n == 0.0) Iterator.empty   // cosine undefined — excluded up front
        else {
          val vn = v.map(_ / n)
          val cs = centsB.value
          val scored = Array.tabulate(cs.length) { c =>
            val ct = cs(c)
            var dot = 0.0; var j = 0
            while (j < ct.length) { dot += vn(j) * ct(j); j += 1 }
            (c, dot)
          }
          scored.sortBy { case (c, dot) => (-dot, c) }.take(nProbe)
            .iterator.map { case (c, _) => (c, id, n, v, nw) }
        }
      }
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val ms = it.map { case (_, id, n, v, nw) => (id, n, v, nw) }.toArray
        require(ms.length <= maxCellMembers,
          s"cosinePairsIvfIncremental cell holds ${ms.length} members " +
            s"(> maxCellMembers=$maxCellMembers): raise numCells (~sqrt(n) " +
            "at scale) so cells stay bounded, or raise maxCellMembers " +
            "deliberately")
        val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < ms.length) {
          val (ida, na, va, newA) = ms(i)
          var j = i + 1
          while (j < ms.length) {
            val (idb, nb, vb, newB) = ms(j)
            // the incremental prune: old×old never verifies (nor pairs)
            if (newA || newB) {
              var dot = 0.0; var d = 0
              while (d < va.length) { dot += va(d) * vb(d); d += 1 }
              val cos = dot / (na * nb)
              if (cos >= threshold) {
                val a = math.min(ida, idb); val b = math.max(ida, idb)
                acc += ((a, b, math.floor(cos * 10000.0 + 0.5) / 10000.0))
              }
            }
            j += 1
          }
          i += 1
        }
        acc.iterator
      }
      .toDF("a", "b", "score")
      .dropDuplicates("a", "b")
      .orderBy("a", "b")
  }

  /** [[cosinePairsIvfWithCentroids]] with the centroids trained in place. */
  def cosinePairsIvf(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numCells: Int = 16,
      nProbe: Int = 2,
      lloydIters: Int = 2,
      trainCap: Int = 4096): DataFrame =
    cosinePairsIvfWithCentroids(embeddings, idCol, vecCol, threshold, nProbe,
      trainIvfCentroids(embeddings, idCol, vecCol, numCells, lloydIters, trainCap))

  /** Deterministic pseudo-random hyperplanes: component j of plane p is a
    * fixed hash-derived value in [-1, 1). No RNG — reproducible across
    * runs and engines; `private[graft]` so the DuckDB oracle SQL can embed
    * the exact same matrix as literals (the ann_lsh hash-oracle path).
    */
  private[graft] def planeComponent(p: Int, j: Int): Double = {
    val h = (p * 1000003L + j * 7919L + 12345L) * 2654435761L % 1000000007L
    (h.toDouble / 1000000007.0) * 2.0 - 1.0
  }

  /** LSH bit signature for one hash table: bit p = sign(v · plane_{offset+p}).
    * The plane matrix is deterministic ([[planeComponent]], no RNG) and is
    * baked into the native codegen expression
    * [[graft.functions.HyperplaneSignature]] (r11): the `Seq[Float]` UDF it
    * replaces boxed every vector component per corpus row on the
    * full-corpus map path of `ann_lsh_topk`.
    */
  def hyperplaneSignature(vec: Column, dim: Int, numPlanes: Int, planeOffset: Int = 0): Column = {
    import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
    colOf(graft.functions.HyperplaneSignature(expression(vec), dim, numPlanes, planeOffset))
  }

  /** IVF (inverted-file) approximate top-k — the other classic ANN scale
    * path next to [[lshTopK]]: a small coarse quantizer (k-means over the
    * L2-normalized corpus) splits vectors into `numCells` inverted lists;
    * a query scores only the `nProbe` cells whose centroids it is closest
    * to, turning the all-pairs scan into an equi-join on cell id that
    * touches ~nProbe/numCells of the corpus.
    *
    * Scale shape: the coarse quantizer is trained on a BOUNDED sample
    * (`trainCap` vectors, hash-ordered take — deterministic, content-
    * independent), the FAISS-standard recipe: quantizer quality needs a
    * representative few thousand vectors, not the corpus, so training is
    * one top-k job + driver-local Lloyd over ≤ trainCap×dim doubles —
    * bounded by construction, unlike a corpus collect. The index build is
    * one map-only pass with the K×dim centroid matrix broadcast; the
    * probe is a (cell, query) × (cell, vector) equi-join with exact
    * re-ranking.
    *
    * Fully deterministic (gate-friendly): the sample is the trainCap
    * lowest ids under a fixed hash order, init centroids are the means of
    * the sample's `id mod numCells` groups, every mean folds its members
    * in ascending-id order, and argmax ties break toward the lower cell
    * id — no RNG anywhere, so the same data always yields the same index.
    * (A corpus within trainCap trains on everything — identical output to
    * the previous all-corpus distributed-Lloyd formulation.) Recall vs
    * [[cosineTopK]] is asserted in tests.
    *
    * SHIPPED DEFAULT (r17, RecallFrontierProbe at the 10× bracket —
    * 200k×64 i.i.d.-Gaussian vectors, the structureless ANN worst case):
    * `nProbe=32` of 64 cells — recall@5 0.944 at LOWER wall than the old
    * r15 16/8 preset (9.9 s vs 11.1 s: same 0.5 probe fraction, but 4×
    * more cells make each probed cell 4× cheaper to scan while the
    * bounded trainer cost is unchanged). The frontier around it:
    * 64/16 → 0.744 @ 7.1 s, 64/48 → 0.996 @ 15.4 s, old 16/8 → 0.820,
    * 16/12 → 0.976 @ 14.3 s. The probe fraction nProbe/numCells is the
    * compute dial — on structureless data recall tracks it (plus a small
    * quantizer bonus), which is WHY the default sits at 0.5. Tripwired
    * in AnnRecallSpec; configs recorded in RECALL.json (+ the sf10dup
    * section for the 10× bracket).
    */
  def ivfTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      numCells: Int = 64,
      nProbe: Int = 32,
      lloydIters: Int = 2,
      trainCap: Int = 4096): DataFrame =
    ivfTopKWithCentroids(embeddings, idCol, vecCol, queryPred, k, nProbe,
      trainIvfCentroids(embeddings, idCol, vecCol, numCells, lloydIters, trainCap))

  /** (id, v, norm, v/norm) prep shared by IVF training and probing. */
  private def ivfPrep(df: DataFrame, idCol: String, vecCol: String) = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), asDouble(col(vecCol)).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val n = math.sqrt(s)
        val vn = if (n == 0.0) v.clone() else v.map(_ / n)
        (id, v, n, vn)
      }
  }

  /** argmax_c dot(vn, cents(c)), strict-greater ascending scan — ties break
    * toward the LOWER cell id (gate-determinism contract; the oracle SQL's
    * `ORDER BY dot DESC, cell` replicates it).
    */
  private[ann] def nearestCell(vn: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity; var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var dot = 0.0; var i = 0
      while (i < ct.length) { dot += vn(i) * ct(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** The IVF coarse quantizer, exposed so callers (and the gate's oracle
    * builder) can hold the trained centroid matrix: deterministic Lloyd
    * over a BOUNDED sample. Fully reproducible — deterministic hash-ordered
    * `trainCap`-row sample, id-mod init, ascending-id mean folds, strict
    * lower-cell tie-breaks, no RNG — so the same data always yields the
    * same matrix, which is what lets the DuckDB oracle embed it as
    * literals (the ann_lsh hyperplane trick applied to a DATA-DEPENDENT
    * index).
    */
  /** BOUNDED deterministic training sample shared by the IVF and PQ
    * trainers: trainCap L2-NORMALIZED rows under a deterministic hash
    * order (multiplicative hash of the id — spreads ids uniformly; the
    * id tiebreak makes the take total). Limit-then-collect = per-partition
    * top-k then a driver merge of trainCap rows, never a full collect.
    */
  private def trainingSample(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      trainCap: Int): Array[(Long, Array[Double])] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    ivfPrep(embeddings, idCol, vecCol)
      .map { case (id, _, _, vn) => (id, vn) }
      .toDF("id", "vn")
      // pmod BEFORE the multiply (r13 review): (id*H) mod p ==
      // ((id mod p)*H) mod p exactly (modular identity, so every existing
      // sample order is unchanged), but the raw multiply overflows long
      // for |id| > ~3.4e9 — an ARITHMETIC_OVERFLOW crash under Spark 4's
      // default ANSI mode on hash-derived ids. The reduced product is
      // bounded by p*H < 2.7e18 < Long.Max.
      .orderBy(pmod(pmod(col("id"), lit(1000000007L)) * lit(2654435761L),
        lit(1000000007L)), col("id"))
      .limit(trainCap)
      .as[(Long, Array[Double])]
      .collect()
      .sortBy(_._1)
  }

  def trainIvfCentroids(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int = 16,
      lloydIters: Int = 2,
      trainCap: Int = 4096): Array[Array[Double]] =
    trainIvfCentroidsFromSample(
      trainingSample(embeddings, idCol, vecCol, trainCap), numCells, lloydIters)

  /** Deterministic driver-local Lloyd mean fold shared by the coarse IVF
    * trainer and the per-subspace PQ codebook trainer (r13 review: two
    * near-identical folds had to stay bit-identical by inspection) —
    * members fold in ascending-id order, empty groups keep their previous
    * centroid.
    */
  private def meanFold(
      assigned: Seq[(Int, Long, Array[Double])],
      prev: Array[Array[Double]]): Array[Array[Double]] = {
    val computed = assigned.groupBy(_._1).map { case (cell, rows0) =>
      val rows = rows0.sortBy(_._2)
      val dim = rows.head._3.length
      val acc = new Array[Double](dim)
      rows.foreach { r =>
        var i = 0; while (i < dim) { acc(i) += r._3(i); i += 1 }
      }
      var i = 0; while (i < dim) { acc(i) /= rows.length; i += 1 }
      (cell, acc)
    }
    Array.tabulate(prev.length)(c => computed.getOrElse(c, prev(c)))
  }

  /** The Lloyd loop over an already-collected sample — shared by
    * [[trainIvfCentroids]] and [[ivfPqTopK]] (which needs the sample
    * itself for codebook training; the previous shape collected the
    * bounded sample twice, r13 review).
    */
  private def trainIvfCentroidsFromSample(
      sample: Array[(Long, Array[Double])],
      numCells: Int,
      lloydIters: Int): Array[Array[Double]] = {
    if (sample.isEmpty) return Array.fill(numCells)(Array.empty[Double])
    // empty cells hold a ZERO VECTOR of the right dimension, not
    // Array.empty (r13 review): nearestCell scores both as dot 0.0 —
    // identical assignment — but downstream residual/codebook arithmetic
    // indexes centroid components, which crashed on the empty array
    // whenever an id-residue class had no sample member
    val dim0 = sample.head._2.length
    val initAssign = sample.toSeq.map { case (id, vn) =>
      ((((id % numCells) + numCells) % numCells).toInt, id, vn)
    }
    var cents = meanFold(initAssign, Array.fill(numCells)(new Array[Double](dim0)))
    for (_ <- 1 to lloydIters) {
      val assigned = sample.toSeq.map { case (id, vn) => (nearestCell(vn, cents), id, vn) }
      cents = meanFold(assigned, cents)
    }
    cents
  }

  /** (id, cell) coarse-quantizer assignment for every vector under an
    * already-trained centroid matrix — one broadcast map pass. The
    * building block behind cluster-balanced corpus selection
    * (`cur_diverse`) and any per-cell statistic.
    */
  def assignCells(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centsB = spark.sparkContext.broadcast(cents)
    ivfPrep(embeddings, idCol, vecCol)
      .map { case (id, _, _, vn) => (id, nearestCell(vn, centsB.value)) }
      .toDF("id", "cell")
  }

  /** [[assignCells]] under a [[TwoLevelQuantizer]] — the assignment pass
    * whose cost model the two-level design exists for: `numSuper +
    * cellsPerSuper` dots per vector instead of `numCells`
    * (AnnAssignCostProbe measures both side by side at the 2M bracket).
    */
  def assignCellsTwoLevel(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      quantizer: TwoLevelQuantizer): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(quantizer)
    ivfPrep(embeddings, idCol, vecCol)
      .map { case (id, _, _, vn) => (id, qB.value.assign(vn)) }
      .toDF("id", "cell")
  }

  /** IVF probe against an already-trained centroid matrix: one map-only
    * index build with the K×dim matrix broadcast, then a (cell, query) ×
    * (cell, vector) equi-join with exact re-ranking.
    */
  def ivfTopKWithCentroids(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nProbe: Int,
      cents: Array[Array[Double]]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    kernels(embeddings) // dotNative resolves by registry name

    // NOT persisted: prep is a map-only pass, and the corpus is scanned
    // exactly twice (the bounded training take-ordered above, then the
    // index build inside the caller's final action). Caching it would save
    // one cheap recompute at the price of a MEMORY_AND_DISK block leaking
    // past the query in library use — callers who probe the same index
    // repeatedly should persist the returned DataFrame themselves.
    // zero-norm vectors are EXCLUDED from both sides (r13 ADVICE): cosine
    // is undefined for them, and 0/0 = NaN sorts ABOVE every real value in
    // the descending rank window — a zero (padding) embedding would rank
    // #1 for every query probing its cell. Mirrors withNorm's nrm > 0
    // guard; the ivf oracle carries the matching n > 0 predicates.
    val corpus = ivfPrep(embeddings, idCol, vecCol).filter(_._3 > 0)

    val centsB = spark.sparkContext.broadcast(cents)
    val index = corpus
      .map { case (id, v, n, vn) => (nearestCell(vn, centsB.value), id, v, n) }
      .toDF("cell", "neighbor_id", "nvec", "nn")
    val probes = ivfPrep(embeddings.where(queryPred), idCol, vecCol)
      .filter(_._3 > 0)
      .flatMap { case (id, v, n, vn) =>
        val cs = centsB.value
        // top nProbe cells by centroid dot, ties toward lower cell id
        val scored = Array.tabulate(cs.length) { c =>
          val ct = cs(c)
          var dot = 0.0; var i = 0
          while (i < ct.length) { dot += vn(i) * ct(i); i += 1 }
          (c, dot)
        }
        scored.sortBy { case (c, dot) => (-dot, c) }.take(nProbe)
          .map { case (c, _) => (c, id, v, n) }
      }
      .toDF("cell", "query_id", "qvec", "qn")

    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    // No dedup needed: the index assigns each neighbor to exactly ONE cell,
    // so a (query, neighbor) pair can meet in at most one probed cell — a
    // dropDuplicates here would be a pure no-op Exchange of vector-laden rows.
    probes.join(index, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotNative(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round4(col("cos")).as("score"))
      .orderBy("query_id", "rank")
  }

  /** IVF-PQ: product-quantization codebooks + ADC probe on top of the IVF
    * coarse quantizer — the MEMORY-side ANN scale path: a 64-dim float
    * vector (256 B) compresses to `m` one-byte codes (8 B at m=8, 32×),
    * which is what lets a 100 TB embedding corpus keep its index in
    * executor memory. Residual encoding (vn − coarse centroid), per-
    * subspace codebooks of `ks` codewords, asymmetric distance at probe
    * time (per-query lookup table, approx dot = centroidDot + Σ_m
    * LUT[m][code_m]), exact re-rank of the top `candidateFactor × k`.
    *
    * Fully deterministic like [[trainIvfCentroids]] (same bounded sample,
    * id-mod init, ascending-id folds, lower-code tie-breaks) — the
    * rows-only gate is stable and the spec asserts reproducibility plus
    * recall-vs-brute.
    */
  /** A trained IVF-PQ model: coarse centroids plus per-subspace residual
    * codebooks (`codebooks(sub)(code)` is a `subDim`-vector). Exposed so
    * callers train once and probe many times, and so the gate's oracle
    * builder can embed the EXACT trained values as SQL literals — the
    * ann_ivf embedded-centroid trick extended to both quantizer layers,
    * which is what flips ann_ivfpq_topk from a frozen pin to a full
    * DuckDB hash oracle (r13 verdict ask #3).
    */
  final case class PqModel(
      cents: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      subDim: Int) {
    def m: Int = codebooks.length
    def ks: Int = if (codebooks.isEmpty) 0 else codebooks(0).length
  }

  /** L2 argmin over a codebook, strict-less ascending scan — ties break
    * toward the LOWER code (determinism contract; the oracle replicates
    * it with `ORDER BY d ASC, code ASC`).
    */
  private def l2Nearest(x: Array[Double], book: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.PositiveInfinity; var c = 0
    while (c < book.length) {
      val w = book(c)
      var d = 0.0; var i = 0
      while (i < w.length) { val t = x(i) - w(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic IVF-PQ training (None on an empty corpus): ONE bounded
    * sample collection feeds both the coarse trainer and the codebook
    * trainer; per-subspace deterministic Lloyd over the sample residuals
    * (same recipe as the coarse trainer: id-mod init, ascending-id mean
    * folds, empty codes keep their centroid, strict lower-code argmin).
    * Residuals are computed ONCE per sample row; each subspace copies out
    * its slice.
    */
  def trainIvfPq(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int = 16,
      m: Int = 8,
      ks: Int = 16,
      lloydIters: Int = 2,
      trainCap: Int = 4096): Option[PqModel] = {
    require(ks <= 256, "one-byte codes: ks must fit a byte")
    val sample = trainingSample(embeddings, idCol, vecCol, trainCap)
    if (sample.isEmpty) return None
    val cents = trainIvfCentroidsFromSample(sample, numCells, lloydIters)
    val dim = sample.head._2.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m

    def residual(vn: Array[Double]): Array[Double] = {
      val c = cents(nearestCell(vn, cents))
      Array.tabulate(vn.length)(i => vn(i) - c(i))
    }
    val residuals = sample.map { case (id, vn) => (id, residual(vn)) }
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { sub =>
      val items = residuals.map { case (id, r) =>
        (id, java.util.Arrays.copyOfRange(r, sub * subDim, (sub + 1) * subDim))
      }
      var book = meanFold(
        items.toSeq.map { case (id, r) => ((((id % ks) + ks) % ks).toInt, id, r) },
        Array.fill(ks)(new Array[Double](subDim)))
      for (_ <- 1 to lloydIters) {
        book = meanFold(items.toSeq.map { case (id, r) => (l2Nearest(r, book), id, r) }, book)
      }
      book
    }
    Some(PqModel(cents, codebooks, subDim))
  }

  /** ADC probe + exact re-rank under an already-trained [[PqModel]]. */
  def ivfPqTopKWithModel(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nProbe: Int,
      candidateFactor: Int,
      model: PqModel): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centsB = spark.sparkContext.broadcast(model.cents)
    val booksB = spark.sparkContext.broadcast(model.codebooks)
    val sd = model.subDim; val mm = model.m; val kks = model.ks

    // index: ONLY (cell, id, m one-byte codes) — the compressed layout;
    // true vectors join back for the exact re-rank of survivors alone
    val index = ivfPrep(embeddings, idCol, vecCol)
      .map { case (id, _, _, vn) =>
        val cs = centsB.value
        val cell = nearestCell(vn, cs)
        val c = cs(cell)
        val books = booksB.value
        val code = new Array[Byte](mm)
        var sub = 0
        while (sub < mm) {
          val r = new Array[Double](sd)
          var i = 0
          while (i < sd) { r(i) = vn(sub * sd + i) - c(sub * sd + i); i += 1 }
          code(sub) = l2Nearest(r, books(sub)).toByte
          sub += 1
        }
        (cell, id, code)
      }
      .toDF("cell", "neighbor_id", "code")

    // probes: per query, nProbe cells with the query-centroid dot and the
    // per-subspace ADC lookup table (m×ks doubles, flat)
    val probes = ivfPrep(embeddings.where(queryPred), idCol, vecCol)
      .flatMap { case (id, _, _, qvn) =>
        val cs = centsB.value
        val books = booksB.value
        val lut = new Array[Double](mm * kks)
        var sub = 0
        while (sub < mm) {
          var j = 0
          while (j < kks) {
            val w = books(sub)(j)
            var s = 0.0; var i = 0
            while (i < sd) { s += qvn(sub * sd + i) * w(i); i += 1 }
            lut(sub * kks + j) = s
            j += 1
          }
          sub += 1
        }
        val scored = Array.tabulate(cs.length) { cell =>
          val ct = cs(cell)
          var dot = 0.0; var i = 0
          while (i < ct.length) { dot += qvn(i) * ct(i); i += 1 }
          (cell, dot)
        }
        scored.sortBy { case (c, dot) => (-dot, c) }.take(nProbe)
          .map { case (cell, cdot) => (cell, id, cdot, lut) }
      }
      .toDF("cell", "query_id", "celldot", "lut")

    // native codegen ADC (r15): the shortlist relation is the ANN family's
    // biggest intermediate (|probes|×|cell members| rows) and the UDF tier
    // boxed the m·ks-double LUT per candidate row — the r10 dd_ppjoin
    // pathology. Same ascending-subspace fold, bit-identical scores.
    val adc = (c: Column, l: Column, d: Column) => call_function(
      "pq_adc_native", c, l, d, lit(kks))
    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("approx").desc, col("neighbor_id"))
    val candidates = kernels(probes).join(index, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx", adc(col("celldot"), col("lut"), col("code")))
      .withColumn("arank", row_number().over(wApprox))
      .where(col("arank") <= k * candidateFactor)
      .select("query_id", "neighbor_id")

    exactRerank(candidates, embeddings, idCol, vecCol, k)
  }

  /** Defaults are the SHIPPED production configuration (r18,
    * RecallFrontierProbe at the 10× bracket — 200k×64 i.i.d.-Gaussian,
    * the structureless worst case): `numCells=64, nProbe=32, m=16,
    * ks=256, candidateFactor=64` — recall@5 **0.940 at 12.7 s**, which
    * SATURATES the coarse-probe fraction bound (plain IVF at the same
    * 0.5 fraction reads 0.944): the PQ shortlist is no longer the
    * bottleneck. The lever ladder, measured: re-rank depth alone
    * (cf 32→128 at m=8/ks=16) bought 0.31→0.50; codebook RESOLUTION is
    * the dominant axis — ks 16→64 at m=8 bought 0.39→0.64, and m=16
    * (4-dim subspaces) × ks=256 reached 0.90–0.94, with nProbe=48
    * reading 0.992 when recall outranks probe cost. The honest memory
    * trade: m=16 one-byte codes = 16 B/vector (16× compression vs raw
    * float32) instead of m=8's 8 B (32×) — still the memory-side tier
    * by a wide margin, and codebooks stay trivial (m×ks×subDim doubles
    * = 128 KB). The r15 preset (16/8/m8/ks16/cf32, recall 0.74 at
    * sf0.1 / 0.22 at 10×) is retained in RECALL_SF10DUP.json's frontier
    * for the trend line. The gate query pins the pedagogical
    * 16/4/m8/ks16/cf8 config explicitly via [[ivfPqTopKWithModel]] and
    * an explicit trainer call; RECALL.json records both configs' recall,
    * floors tripwired in AnnRecallSpec + RecallFrontierProbe.
    */
  def ivfPqTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      numCells: Int = 64,
      nProbe: Int = 32,
      m: Int = 16,
      ks: Int = 256,
      candidateFactor: Int = 64,
      lloydIters: Int = 2,
      trainCap: Int = 4096): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    trainIvfPq(embeddings, idCol, vecCol, numCells, m, ks, lloydIters, trainCap) match {
      case None => Seq.empty[(Long, Int, Long, Double)]
        .toDF("query_id", "rank", "neighbor_id", "score")
      case Some(model) => ivfPqTopKWithModel(
        embeddings, idCol, vecCol, queryPred, k, nProbe, candidateFactor, model)
    }
  }

  /** Deterministic uniform in (0,1) from an id — drives HNSW level
    * assignment without RNG (same reproducibility contract as
    * [[planeComponent]] and the IVF trainer).
    */
  private def uniformOf(id: Long): Double = {
    val h = ((id * 2654435761L + 0x9e3779b9L) % 1000000007L + 1000000007L) % 1000000007L
    (h.toDouble + 1.0) / 1000000008.0
  }

  /** In-task HNSW graph over one shard's (id, normalized vector) rows —
    * the classic Malkov-Yashunin hierarchical navigable small world, made
    * fully deterministic: insertion in ascending id, levels from a
    * hash-derived uniform (no RNG), distance ties broken toward the lower
    * id. Similarity = dot over L2-normalized vectors (cosine order).
    */
  /** Growable primitive int list — the adjacency-list cell of
    * [[HnswGraph]] (r19: the boxed `ArrayBuffer[Int]` adjacency measured
    * as a top allocation site in the 2M-row shard builds).
    */
  /** Adjacency list with the edge SCORE carried alongside each neighbor
    * (r20, guide §1.2 step 2): the backlink-prune in [[HnswGraph.insert]]
    * re-ran one dot product per stored edge on EVERY overflow — at m=16
    * that is 33 d-dim dots per level-0 prune, paid repeatedly as the
    * graph grows. Every edge's score is already in hand when the edge is
    * added (`fS(si)` = dot(v, vecs(n)), and dot is elementwise-commutative
    * in IEEE — a(i)*b(i) == b(i)*a(i) exactly, same ascending-i summation
    * order — so the stored double equals the recomputed
    * dot(vecs(n), vecs(x)) bit-for-bit). Pruning therefore sorts stored
    * scores instead of recomputing them; graphs are bit-identical
    * (HnswPrimitiveEquivalenceSpec pins dump + search equality against
    * the boxed reference implementation).
    */
  private[ann] final class EdgeBuf(initCap: Int = 8) {
    private[ann] var arr = new Array[Int](initCap)
    private[ann] var sc = new Array[Double](initCap)
    private[ann] var len = 0
    @inline def apply(i: Int): Int = arr(i)
    @inline def score(i: Int): Double = sc(i)
    def add(x: Int, s: Double): Unit = {
      if (len == arr.length) {
        arr = java.util.Arrays.copyOf(arr, arr.length * 2)
        sc = java.util.Arrays.copyOf(sc, sc.length * 2)
      }
      arr(len) = x; sc(len) = s; len += 1
    }
    /** Replace contents with the first `n` entries of `xs`/`ss`. */
    def reset(xs: Array[Int], ss: Array[Double], n: Int): Unit = {
      if (n > arr.length) {
        arr = java.util.Arrays.copyOf(xs, n)
        sc = java.util.Arrays.copyOf(ss, n)
      } else {
        System.arraycopy(xs, 0, arr, 0, n)
        System.arraycopy(ss, 0, sc, 0, n)
      }
      len = n
    }
  }

  /** Primitive (score, node) binary heap for the HNSW beam — replaces
    * `PriorityQueue[(Double, Int)]`, whose per-enqueue tuple boxing and
    * boxed-tuple comparator dominated build CPU at the 2M bracket (r19).
    *
    * Ordering is EXACTLY the old `Ordering.by((-s, ids(n)))`: `beats`
    * compares via `Double.compare(-sa, -sb)` (same ±0.0/NaN total order)
    * then lower id. Heap content decisions (eviction at overflow, dequeue
    * order, early-break) depend only on this comparator, and all keys are
    * distinct in id, so the externally observable sequence is identical
    * to the PriorityQueue form — graphs and search results are
    * bit-identical (HnswPrimitiveEquivalenceSpec pins this against a
    * verbatim copy of the boxed implementation).
    *
    * `rootIsWorst = true` is the results heap (head = worst kept, evict
    * on overflow); `false` is the candidates heap (head = best).
    */
  private[ann] final class BeamHeap(rootIsWorst: Boolean, initCap: Int = 64) {
    private[this] var sc = new Array[Double](initCap)
    private[this] var nd = new Array[Int](initCap)
    private[this] var n = 0
    @inline def size: Int = n
    @inline def nonEmpty: Boolean = n > 0
    @inline def headScore: Double = sc(0)
    @inline def headNode: Int = nd(0)
    def clear(): Unit = n = 0
    // "a beats b" = the old tuple order (-sa, ia) < (-sb, ib)
    @inline private def beats(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
      val c = java.lang.Double.compare(-sa, -sb)
      c < 0 || (c == 0 && ia < ib)
    }
    @inline private def above(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      if (rootIsWorst) beats(sb, ib, sa, ia) else beats(sa, ia, sb, ib)
    def add(s: Double, node: Int, ids: Array[Long]): Unit = {
      if (n == sc.length) {
        sc = java.util.Arrays.copyOf(sc, n * 2)
        nd = java.util.Arrays.copyOf(nd, n * 2)
      }
      var i = n; n += 1
      var placing = true
      while (placing && i > 0) {
        val p = (i - 1) >> 1
        if (above(s, ids(node), sc(p), ids(nd(p)))) {
          sc(i) = sc(p); nd(i) = nd(p); i = p
        } else placing = false
      }
      sc(i) = s; nd(i) = node
    }
    def removeHead(ids: Array[Long]): Unit = {
      n -= 1
      if (n == 0) return
      val s = sc(n); val node = nd(n)
      var i = 0
      while (true) {
        val l = 2 * i + 1
        if (l >= n) { sc(i) = s; nd(i) = node; return }
        var c = l
        val r = l + 1
        if (r < n && above(sc(r), ids(nd(r)), sc(l), ids(nd(l)))) c = r
        if (above(sc(c), ids(nd(c)), s, ids(node))) {
          sc(i) = sc(c); nd(i) = nd(c); i = c
        } else { sc(i) = s; nd(i) = node; return }
      }
    }
    /** Drain into (scores, nodes) sorted best-first — the old
      * `res.toSeq.sortBy((-s, ids(n)))` boundary, allocation-light.
      */
    def sortedBestFirst(ids: Array[Long]): (Array[Double], Array[Int]) = {
      val outS = new Array[Double](n)
      val outN = new Array[Int](n)
      // insertion sort by `beats` — beams are <= ef entries
      var i = 0
      while (i < n) {
        val s = sc(i); val node = nd(i)
        var j = i - 1
        while (j >= 0 && beats(s, ids(node), outS(j), ids(outN(j)))) {
          outS(j + 1) = outS(j); outN(j + 1) = outN(j); j -= 1
        }
        outS(j + 1) = s; outN(j + 1) = node
        i += 1
      }
      (outS, outN)
    }
  }

  private[ann] final class HnswGraph(m: Int, efConstruction: Int) {
    private val mL = 1.0 / math.log(m.toDouble)
    // r19: primitive growable columns (boxed ArrayBuffer[Long]/[Int] id and
    // level accesses sat inside every tie-break of the beam hot loop)
    private var ids = new Array[Long](64)
    private var vecs = new Array[Array[Double]](64)
    private var levels = new Array[Int](64)
    private var neighbors = new Array[Array[EdgeBuf]](64)
    private var count = 0
    private var entry = -1
    // epoch-stamped visited marks, reused across searchLayer calls (the
    // boxed HashSet[Int] was the other top allocation site)
    private var marks = new Array[Int](64)
    private var stamp = 0
    private val cand = new BeamHeap(rootIsWorst = false)
    private val res = new BeamHeap(rootIsWorst = true)

    private[ann] def size: Int = count
    private[ann] def idAt(i: Int): Long = ids(i)

    private def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }

    /** Greedy beam search at one level into `res` (worst-first, capped at
      * `ef`); deterministic via the (−sim, id) ordering — see [[BeamHeap]]
      * for the bit-identity argument vs the boxed r18 form.
      */
    private def searchLayer(
        q: Array[Double], ep: Int, ef: Int, level: Int): Unit = {
      stamp += 1
      val st = stamp
      marks(ep) = st
      val epS = dot(q, vecs(ep))
      cand.clear(); res.clear()
      cand.add(epS, ep, ids)
      res.add(epS, ep, ids)
      while (cand.nonEmpty) {
        val cs = cand.headScore; val c = cand.headNode
        cand.removeHead(ids)
        val worst = res.headScore
        if (cs < worst && res.size >= ef) { cand.clear() }
        else {
          val ns = neighbors(c)(level)
          var i = 0
          while (i < ns.len) {
            val n = ns(i)
            if (marks(n) != st) {
              marks(n) = st
              val s = dot(q, vecs(n))
              if (res.size < ef || s > res.headScore ||
                (s == res.headScore && ids(n) < ids(res.headNode))) {
                cand.add(s, n, ids)
                res.add(s, n, ids)
                if (res.size > ef) res.removeHead(ids)
              }
            }
            i += 1
          }
        }
      }
    }

    def insert(id: Long, v: Array[Double]): Unit = {
      val node = count
      if (count == ids.length) {
        val cap = count * 2
        ids = java.util.Arrays.copyOf(ids, cap)
        vecs = java.util.Arrays.copyOf(vecs, cap)
        levels = java.util.Arrays.copyOf(levels, cap)
        neighbors = java.util.Arrays.copyOf(neighbors, cap)
        marks = java.util.Arrays.copyOf(marks, cap)
      }
      val lvl = math.min(15, math.floor(-math.log(uniformOf(id)) * mL).toInt)
      ids(node) = id; vecs(node) = v; levels(node) = lvl
      neighbors(node) = Array.fill(lvl + 1)(new EdgeBuf())
      count += 1
      if (entry < 0) { entry = node; return }
      var ep = entry
      val topLvl = levels(entry)
      // greedy descend above the node's level
      var l = topLvl
      while (l > lvl) {
        var improved = true
        var best = ep; var bestS = dot(v, vecs(ep))
        while (improved) {
          improved = false
          val ns = neighbors(best)(l)
          var i = 0
          while (i < ns.len) {
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
      // connect at each level from min(topLvl, lvl) down to 0
      l = math.min(topLvl, lvl)
      while (l >= 0) {
        searchLayer(v, ep, efConstruction, l)
        val (fS, fN) = res.sortedBestFirst(ids)
        val cap = if (l == 0) 2 * m else m
        val take = math.min(m, fN.length)
        var si = 0
        while (si < take) {
          val n = fN(si)
          // fS(si) = dot(v, vecs(n)) — the edge score, identical both
          // directions (IEEE elementwise commutativity, see [[EdgeBuf]])
          neighbors(node)(l).add(n, fS(si))
          val back = neighbors(n)(l)
          back.add(node, fS(si))
          if (back.len > cap) {
            // prune to the cap best by similarity to n (ties: lower id) —
            // same (−sim, id) insertion sort as the beam drain, over the
            // CARRIED scores (r20: no dot recomputation per overflow)
            val bs = new Array[Double](back.len)
            val bn = new Array[Int](back.len)
            var bi = 0
            while (bi < back.len) {
              val x = back(bi)
              val s = back.score(bi)
              var j = bi - 1
              while (j >= 0 && {
                val c = java.lang.Double.compare(-s, -bs(j))
                c < 0 || (c == 0 && ids(x) < ids(bn(j)))
              }) {
                bs(j + 1) = bs(j); bn(j + 1) = bn(j); j -= 1
              }
              bs(j + 1) = s; bn(j + 1) = x
              bi += 1
            }
            back.reset(bn, bs, cap)
          }
          si += 1
        }
        ep = fN(0)
        l -= 1
      }
      if (lvl > levels(entry)) entry = node
    }

    /** Structural dump: entry, per-node top level, adjacency lists in
      * array order. The oracle's batch replay of the beam sweep is
      * order-independent (the bounded-heap result is the set top-ef of
      * everything examined — see TextQueries.hnswOracle for the
      * argument, HnswOracleEquivalenceSpec for the pin), but the dump
      * preserves array order anyway so heap-faithful re-executions can
      * also be driven from it.
      */
    def dump(shard: Int): HnswShardDump = HnswShardDump(
      shard,
      if (entry < 0) -1L else ids(entry),
      if (entry < 0) -1 else levels(entry),
      Array.tabulate(count)(i => (ids(i), levels(i))),
      (for { i <- 0 until count; l <- 0 to levels(i) } yield
        (ids(i), l, Array.tabulate(neighbors(i)(l).len)(j =>
          ids(neighbors(i)(l)(j))))).toArray)

    /** Immutable flat-array (CSR) view of the finished graph — the ONE
      * searchable representation ([[searchFrozen]]): the transient probes
      * freeze right after build, and the standing [[HnswRoutedIndex]]
      * persists these rows so query batches skip the build entirely.
      * Flattening is one linear copy, trivially cheap next to insert.
      */
    def freeze(key: Long, cell: Int): FrozenShard = {
      val n = count
      val levelBase = new Array[Int](n)
      var tot = 0
      var i = 0
      while (i < n) { levelBase(i) = tot; tot += levels(i) + 1; i += 1 }
      val adjOff = new Array[Int](tot + 1)
      var slot = 0; var acc = 0
      i = 0
      while (i < n) {
        var l = 0
        while (l <= levels(i)) {
          adjOff(slot) = acc; acc += neighbors(i)(l).len; slot += 1; l += 1
        }
        i += 1
      }
      adjOff(tot) = acc
      val adjFlat = new Array[Int](acc)
      var p = 0
      i = 0
      while (i < n) {
        var l = 0
        while (l <= levels(i)) {
          val ns = neighbors(i)(l)
          var j = 0
          while (j < ns.len) { adjFlat(p) = ns(j); p += 1; j += 1 }
          l += 1
        }
        i += 1
      }
      FrozenShard(key, cell, entry,
        java.util.Arrays.copyOf(ids, n), java.util.Arrays.copyOf(levels, n),
        java.util.Arrays.copyOf(vecs, n), levelBase, adjOff, adjFlat)
    }
  }

  /** One finished HNSW shard graph as flat arrays — node-indexed, CSR
    * adjacency (`adjFlat[adjOff(levelBase(n)+l) until adjOff(levelBase(n)
    * +l+1)]` = node `n`'s level-`l` neighbor indices). This is the ONLY
    * searchable form ([[searchFrozen]] is the single search
    * implementation — the r13 one-copy discipline applied to the beam),
    * and it is a Spark-encodable product, which is what lets
    * [[HnswRoutedIndex]] persist built graphs as a Dataset and serve
    * query batches without rebuilding. `key`/`cell` carry the routed
    * layout ([[routedShardKey]]); plain hash shards use (-1, -1).
    */
  private[ann] final case class FrozenShard(
      key: Long,
      cell: Int,
      entry: Int,
      ids: Array[Long],
      levels: Array[Int],
      vecs: Array[Array[Double]],
      levelBase: Array[Int],
      adjOff: Array[Int],
      adjFlat: Array[Int])

  /** Top-k (id, dot) for one query over a frozen shard, self excluded —
    * the greedy upper-level descent + ef-bounded level-0 beam of the
    * classic HNSW search, ported verbatim from the builder's mutable form
    * (same (−sim, lower-id) orderings everywhere, so gate determinism
    * and the DuckDB beam re-derivation are unchanged).
    */
  private[ann] def searchFrozen(
      fs: FrozenShard, q: Array[Double], selfId: Long, k: Int,
      ef: Int): Seq[(Long, Double)] = {
    if (fs.entry < 0) return Seq.empty
    val ids = fs.ids; val vecs = fs.vecs
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // greedy descent above level 0
    var ep = fs.entry
    var l = fs.levels(fs.entry)
    while (l > 0) {
      var improved = true
      var best = ep; var bestS = dot(q, vecs(ep))
      while (improved) {
        improved = false
        val base = fs.levelBase(best) + l
        var i = fs.adjOff(base); val end = fs.adjOff(base + 1)
        while (i < end) {
          val n = fs.adjFlat(i)
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
    // ef-bounded beam at level 0 (candidates best-first, results
    // worst-first capped at ef — the searchLayer orderings; r19:
    // primitive BeamHeap + boolean visited marks replace the boxed
    // PriorityQueue/HashSet, same (−sim, id) total order, bit-identical
    // results — see BeamHeap's scaladoc)
    val efq = math.max(ef, k + 1)
    val visited = new Array[Boolean](ids.length)
    visited(ep) = true
    val epS = dot(q, vecs(ep))
    val cand = new BeamHeap(rootIsWorst = false)
    val res = new BeamHeap(rootIsWorst = true)
    cand.add(epS, ep, ids)
    res.add(epS, ep, ids)
    while (cand.nonEmpty) {
      val cs = cand.headScore; val c = cand.headNode
      cand.removeHead(ids)
      val worst = res.headScore
      if (cs < worst && res.size >= efq) { cand.clear() }
      else {
        val base = fs.levelBase(c) // level 0
        var i = fs.adjOff(base); val end = fs.adjOff(base + 1)
        while (i < end) {
          val n = fs.adjFlat(i)
          if (!visited(n)) {
            visited(n) = true
            val s = dot(q, vecs(n))
            if (res.size < efq || s > res.headScore ||
              (s == res.headScore && ids(n) < ids(res.headNode))) {
              cand.add(s, n, ids)
              res.add(s, n, ids)
              if (res.size > efq) res.removeHead(ids)
            }
          }
          i += 1
        }
      }
    }
    val (rS, rN) = res.sortedBestFirst(ids)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    var i = 0
    while (i < rN.length && out.length < k) {
      val id = ids(rN(i))
      if (id != selfId) out += ((id, rS(i)))
      i += 1
    }
    out.toSeq
  }

  /** Sharded HNSW approximate top-k — the GRAPH-index ANN scale path next
    * to [[lshTopK]] (hashing) and [[ivfTopK]] (coarse quantization): the
    * corpus hash-partitions into `numShards` shards, each task builds an
    * in-memory HNSW over ITS shard (the standard distributed-HNSW layout —
    * one navigable-small-world graph per executor-sized shard), every
    * broadcast query beam-searches every shard graph, and a final per-query
    * rank merges the shard-local top-k. Exact cosine re-scoring of the
    * surviving candidates keeps the output arithmetic identical to
    * [[cosineTopK]]'s (same fold, same rounding).
    *
    * Fully deterministic (no RNG): hash-derived levels, ascending-id
    * insertion, lower-id tie-breaks — the same reproducibility contract as
    * the IVF trainer, so the rows-only gate is stable across runs.
    * Rows-only because greedy graph traversal is not SQL-expressible at
    * reasonable cost; recall >= the IVF path at equal candidate budget is
    * spec-asserted instead.
    *
    * Scale shape: build is one mapPartitions pass (shard graphs never
    * leave their tasks, memory = shard size × (vector + M links)); probe
    * moves only the broadcast queries and (query, id, score) triples.
    * Contract: the QUERY SET is driver-collected and broadcast (every
    * shard beam-searches every query), so `queryPred` must select a small
    * set — enforced by `maxQueries` (fail-fast, no partial work). For
    * large query sets use [[ivfTopK]]/[[ivfPqTopK]], whose probes stay
    * distributed.
    *
    * SHIPPED DEFAULT (r17, RecallFrontierProbe at the 10× bracket —
    * 200k×64 i.i.d.-Gaussian vectors): `m=16, ef=128` — recall@5 1.000
    * at 32 shards (13.8 s build+search) vs the old m=8/ef=64's 0.804
    * (9.7 s); m=8/ef=128 reads 0.956, m=16/ef=192 also 1.000 at 21.1 s
    * (past the knee). Beam width and graph degree, not shard count, are
    * the recall levers — 8 shards at m=16/ef=192 measured 0.968 but
    * 72 s, build parallelism capped at 8 of 32 cores — so shards should
    * track cores (build cost) while m/ef carry quality. The gate pins
    * the pedagogical 8/8/64 config explicitly (AnnGateConfigSpec); the
    * 10× rows + floors live in RECALL.json's sf10dup section.
    */
  def hnswTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      numShards: Int = 8,
      m: Int = 16,
      ef: Int = 128,
      maxQueries: Int = 4096): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._

    // (id, normalized vector) via the shared ivfPrep (r13 review: a local
    // duplicate of the normalize-with-guard loop kept a second source of
    // truth for the arithmetic the shard graphs depend on)
    def prep(df: DataFrame) =
      ivfPrep(df, idCol, vecCol).map { case (id, _, _, vn) => (id, vn) }

    // Query vectors ARE collected and broadcast (unlike ivfTopK's
    // distributed probes): every shard graph beam-searches every query, so
    // the query set must be small. Enforce that contract instead of
    // assuming it — the only other driver-side collects in the library are
    // similarly bounded (the 4096-row IVF trainer, the union-find edge cap).
    val overCap = prep(embeddings.where(queryPred)).take(maxQueries + 1)
    require(overCap.length <= maxQueries,
      s"hnswTopK: queryPred matched more than maxQueries=$maxQueries rows; " +
        "the HNSW probe broadcasts the full query set to every shard — " +
        "narrow the predicate, chunk the queries, or raise maxQueries " +
        "deliberately (driver memory = queries x dim x 8 bytes).")
    val queries = overCap.sortBy(_._1)
    val queriesB = spark.sparkContext.broadcast(queries)
    val kk = k; val mm = m; val eff = ef

    val candidates = prep(embeddings)
      .groupByKey { case (id, _) => hnswShardOf(id, numShards) }
      .flatMapGroups { (_, it) =>
        val g = buildShardGraph(it.toArray, mm, eff).freeze(-1L, -1)
        queriesB.value.iterator.flatMap { case (qid, qv) =>
          searchFrozen(g, qv, qid, kk, eff).iterator
            .map { case (nid, _) => (qid, nid) }
        }
      }
      .toDF("query_id", "neighbor_id")

    // exact re-scoring + global merge: identical arithmetic to cosineTopK
    exactRerank(candidates, embeddings, idCol, vecCol, k)
  }

  private def hnswShardOf(id: Long, numShards: Int): Int =
    (((id % numShards) + numShards) % numShards).toInt

  /** Corpus-adaptive shard count for [[hnswTopK]] (r17, measured at the
    * sf100 bracket): insert cost grows with GRAPH size, so a fixed shard
    * count makes the build superlinear in corpus — 2M×64 vectors took
    * 332 s at 32 shards vs 146 s at 128 (and recall is monotone in shard
    * count: candidates are the union of per-shard top-k, measured
    * 0.56→0.81 for 8→32 at the 10× bracket). Keep shards ≥ cores (build
    * parallelism) and per-shard rows near `targetShardRows`. The 1024
    * cap is the honest limit of this lever: every query beam-searches
    * EVERY shard, so fan-out grows linearly with shards — past it a
    * corpus needs a shard-routing layer (e.g. IVF over shard centroids),
    * not more brute fan-out.
    */
  def hnswShardsFor(
      corpusRows: Long, cores: Int, targetShardRows: Int = 16384): Int = {
    require(corpusRows >= 0 && cores > 0 && targetShardRows > 0)
    val byRows = (corpusRows + targetShardRows - 1) / targetShardRows
    math.min(1024L, math.max(cores.toLong, byRows)).toInt
  }

  /** Shared by the in-task probe and the oracle dump: ascending-id
    * insertion makes the graph a pure function of the shard's rows.
    */
  private[ann] def buildShardGraph(
      rows: Array[(Long, Array[Double])], m: Int, ef: Int): HnswGraph = {
    val g = new HnswGraph(m, math.max(ef, 2 * m))
    rows.sortBy(_._1).foreach { case (id, vn) => g.insert(id, vn) }
    g
  }

  /** One shard's HNSW structure: entry point, per-node top level, and
    * adjacency lists in array order (see [[HnswGraph.dump]] on why order
    * is part of the contract).
    */
  final case class HnswShardDump(
      shard: Int,
      entryId: Long,
      entryLevel: Int,
      nodeLevels: Array[(Long, Int)],
      adjacency: Array[(Long, Int, Array[Long])])

  /** Driver-side rebuild of the exact shard graphs [[hnswTopK]]'s tasks
    * construct — possible because the build is fully deterministic (hash-
    * derived levels, ascending-id insertion, lower-id tie-breaks): the
    * same rows always produce the same graph, in a task or on the driver.
    * This is what lets the gate's DuckDB oracle treat the graph like the
    * IVF centroids — a TRAINED ARTIFACT embedded as literals — and then
    * independently re-derive the search (greedy descent + bounded beam)
    * from the raw parquet vectors.
    *
    * ORACLE-DUMP HELPER ONLY: collects up to `maxRows` prep rows to the
    * driver (fail-fast above the cap, no partial work) — the production
    * probe path never moves shard graphs or the corpus off the executors.
    */
  def hnswIndexDump(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      numShards: Int = 8,
      m: Int = 8,
      ef: Int = 64,
      maxRows: Int = 100000): Array[HnswShardDump] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val over = ivfPrep(embeddings, idCol, vecCol)
      .map { case (id, _, _, vn) => (id, vn) }
      .take(maxRows + 1)
    require(over.length <= maxRows,
      s"hnswIndexDump: corpus exceeds maxRows=$maxRows rows; this helper " +
        "rebuilds the shard graphs on the driver for the oracle dump and " +
        "is not a production probe — raise maxRows deliberately or dump " +
        "at a smaller scale.")
    over.groupBy { case (id, _) => hnswShardOf(id, numShards) }
      .toArray.sortBy(_._1)
      .map { case (shard, rows) => buildShardGraph(rows, m, ef).dump(shard) }
  }

  /** splitmix64 finalizer (Steele/Lea/Flood, public domain) — spreads the
    * id before the sub-shard modulo so congruent id blocks (planted
    * duplicate classes are consecutive ids) don't land one residue.
    * Deterministic, shared by the production grouping and the oracle dump.
    */
  private[ann] def mix64(id: Long): Long = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** (cell, subShard) → the Long grouping key for routed HNSW shards.
    * Sub-shard factors are capped at 2^20 — a single cell would need
    * ~17 G rows at the default 16384-row target to exceed it
    * (enforced on the Long in [[routedSubFactorOf]]). */
  private[ann] def routedShardKey(cell: Int, sub: Int): Long =
    (cell.toLong << 20) | sub.toLong

  /** Sub-shard of `id` within a cell of `factor` sub-shards: hash-spread
    * (expectation-balanced; the build task fail-fasts if a shard still
    * exceeds 8× the target, see [[hnswRoutedTopK]]). */
  private[ann] def routedSubOf(id: Long, factor: Int): Int =
    (((mix64(id) % factor) + factor) % factor).toInt

  /** Sub-shard factor for a cell of `n` rows: ceil(n / maxShardRows),
    * min 1 — ONE copy shared by the production grouping and the oracle
    * dump (the [[routedSubOf]] anti-drift rule applied to the factor).
    * The 2^20 key-layout bound is enforced HERE on the Long, before the
    * narrowing: a post-.toInt check would let an overflowed factor wrap
    * negative and slip past `< 2^20`. */
  private[ann] def routedSubFactorOf(n: Long, maxShardRows: Int): Int = {
    val f = math.max(1L, (n + maxShardRows - 1) / maxShardRows)
    require(f < (1L << 20),
      s"routed HNSW: a cell of $n rows needs $f sub-shards, past the " +
        "2^20 key-layout bound — raise maxShardRows")
    f.toInt
  }

  /** Per-query top `nProbeCells` routing cells by centroid dot — the IVF
    * probe rule (dot DESC, ties toward the lower cell), shared by the
    * production router and the dump so the two can never drift. */
  private def routeCells(
      vn: Array[Double], cents: Array[Array[Double]], nProbeCells: Int): Array[Int] = {
    val scored = Array.tabulate(cents.length) { c =>
      val ct = cents(c)
      var dot = 0.0; var i = 0
      while (i < ct.length) { dot += vn(i) * ct(i); i += 1 }
      (c, dot)
    }
    scored.sortBy { case (c, dot) => (-dot, c) }.take(nProbeCells).map(_._1)
  }

  /** ROUTED sharded HNSW — the scale path past [[hnswShardsFor]]'s 1024
    * fan-out cap: instead of every query beam-searching every shard,
    * shards are SEMANTIC (one per IVF-trained centroid cell, the same
    * bounded deterministic trainer as [[ivfTopK]]) and each query visits
    * only its `nProbeCells` nearest cells. Per-query cost is then
    * nProbeCells × sub-shards-per-cell regardless of corpus size, which
    * is what removes the cap: cells can grow with the corpus while the
    * probed fraction stays fixed.
    *
    * Cells are data-sized, so a hot cell is SUB-SHARDED back to
    * `maxShardRows`-target graphs: factor = ceil(cellRows / maxShardRows),
    * membership by hash-spread id (deterministic; planted-class id blocks
    * spread evenly). That keeps the per-task build memory bound — the
    * invariant that survives executor-count changes — independent of the
    * centroid balance, with a loud fail at 8× the target if the spread
    * itself degenerates (byte-bound discipline of the stab join applied
    * here to rows). The 16384-row default is the r17 superlinear-build
    * finding applied here: HNSW insert cost grows with graph size, so
    * k-means cells left whole (an earlier 65536 default) let the big
    * cells pay superlinear inserts — measured at the 100× bracket as
    * 299 s vs the balanced full-fan-out build's 180 s; sub-sharding to
    * the same ~16k rows `hnswShardsFor` targets removes the imbalance
    * penalty, and recall only rises (candidates are a union of per-shard
    * top-k).
    *
    * Query-driven economics: only ROUTED cells are shuffled and built
    * (the corpus filter drops unrouted cells before the exchange), so a
    * transient probe pays nProbeCells/numCells of the corpus, not all of
    * it. A standing index that serves many query batches should persist
    * the assigned corpus and raise nProbeCells instead of rebuilding.
    *
    * Determinism end-to-end (trainer, assignment, hash-spread, graph
    * build, routing ties) is what lets [[hnswRoutedIndexDump]] rebuild the
    * exact artifact driver-side for the gate's DuckDB oracle, which
    * re-derives the ROUTING (centroid literals, the IVF probe rule) as
    * well as every search decision. Same query contract as [[hnswTopK]]:
    * the query set is collected and broadcast, `maxQueries` fail-fast.
    *
    * SHIPPED DEFAULT (r17.5, RecallFrontierProbe `routed` family at the
    * 10× bracket): `numCells=64, nProbeCells=32, m=16, ef=128`. On
    * STRUCTURELESS data (i.i.d. Gaussian — the ANN worst case) routing
    * recall is information-theoretically bounded by the probed fraction
    * (true neighbors are uniform over cells): measured 0.944 at 32/64,
    * 0.744 at 16/64, 0.544 at 8/64 — so the safe default probes half.
    * On CLUSTERED corpora (the production case; the probe's planted-
    * cluster arm) small fractions retain recall, and THAT is where the
    * routing win lives: drop nProbeCells toward 4-8 when the corpus has
    * real structure, keep ≥ numCells/2 when it may not. Assignment cost
    * is linear in numCells (one dot per cell per vector) — MEASURED at
    * the 2M×64 bracket (AnnAssignCostProbe, r18): 7.5 s at 128 cells,
    * 35 s at 1024, ~6 min at 4096, ~14 min at 10240, against a ~2-3 min
    * full-corpus graph build — so the documented cliff is ~4k cells at
    * this scale (where assignment rivals the build it exists to avoid);
    * past it, use the r18.5 [[TwoLevelQuantizer]] ([[hnswRoutedTopKTwoLevel]])
    * instead of widening this one — measured at the same bracket:
    * 10240-flat-equivalent cells assign in 13.8 s as 128×80 (vs 841 s
    * flat, 61×) and 22.3 s as 32×320; 4096-equivalent in 9.4 s as 64×64
    * (vs 364.6 s flat) — the numSuper+cellsPerSuper dots/row cost model
    * within 3% of measurement. Shipped configs sit at 64-128 cells, two
    * orders of magnitude under the cliff, so the flat quantizer remains
    * the default.
    */
  def hnswRoutedTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      numCells: Int = 64,
      nProbeCells: Int = 32,
      m: Int = 16,
      ef: Int = 128,
      maxShardRows: Int = 16384,
      maxQueries: Int = 4096,
      lloydIters: Int = 2,
      trainCap: Int = 4096): DataFrame = {
    require(numCells > 0)
    val cents = trainIvfCentroids(
      embeddings, idCol, vecCol, numCells, lloydIters, trainCap)
    hnswRoutedTopKWithCentroids(embeddings, idCol, vecCol, queryPred, k,
      nProbeCells, m, ef, maxShardRows, maxQueries, cents)
  }

  /** [[hnswRoutedTopK]] against an already-trained centroid matrix (the
    * [[ivfTopKWithCentroids]] seam — callers who persist the quantizer
    * probe without retraining; the gate's oracle builder holds it).
    *
    * Probe-budget note (r17 ADVICE): routing picks each query's top
    * `nProbeCells` cells by centroid dot WHETHER OR NOT the corpus
    * populates them — a probe spent on an empty cell contributes no
    * candidates (it costs nothing on the build side, since only routed
    * cells that EXIST in the corpus are shuffled/built, but it does
    * spend recall budget). On very skewed corpora where the trainer
    * leaves cells empty, raise `nProbeCells` — or prefer
    * [[hnswAutoTopK]], whose decision inputs surface the probed-union
    * size. */
  def hnswRoutedTopKWithCentroids(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nProbeCells: Int,
      m: Int,
      ef: Int,
      maxShardRows: Int,
      maxQueries: Int,
      cents: Array[Array[Double]]): DataFrame =
    hnswRoutedTopKQuantized(embeddings, idCol, vecCol, queryPred, k,
      nProbeCells, m, ef, maxShardRows, maxQueries, FlatQuantizer(cents))

  /** The coarse-quantizer seam of the routed-HNSW family: assignment
    * (which cell holds a corpus vector) and routing (which cells a query
    * probes) behind one small serializable value, so the routed probe
    * machinery is written once and the quantizer SHAPE — flat linear
    * scan vs the two-level hierarchy — is a plug. Implementations must
    * be deterministic (gate/oracle contract).
    */
  private[ann] sealed trait CoarseQuantizer extends Serializable {
    def numCells: Int
    def assign(vn: Array[Double]): Int
    def route(vn: Array[Double], nProbeCells: Int): Array[Int]
  }

  /** The single-level quantizer every shipped config uses: one dot per
    * centroid per vector — linear in `numCells`, which is fine at the
    * shipped 64–128 cells and becomes the measured cliff at ~4k
    * (AnnAssignCostProbe, 2M×64: 7.5 s at 128 cells → 841 s at 10240;
    * crossover with the graph build ~4k). Past that, use
    * [[TwoLevelQuantizer]].
    */
  private[ann] final case class FlatQuantizer(
      cents: Array[Array[Double]]) extends CoarseQuantizer {
    def numCells: Int = cents.length
    def assign(vn: Array[Double]): Int = nearestCell(vn, cents)
    def route(vn: Array[Double], n: Int): Array[Int] = routeCells(vn, cents, n)
  }

  /** Two-level coarse quantizer — the productized answer to the measured
    * assignment-cost cliff (r18 AnnAssignCostProbe: one full-corpus
    * assignment pass at 2M×64 reads 7.5 s at 128 flat cells but 841 s at
    * 10240 — linear in numCells — crossing the graph build's own cost at
    * ~4k cells). Routing first picks the `nProbeSuper` nearest of
    * `l1.length` super-centroids, then ranks only THEIR children: both
    * assignment and routing pay `l1.length + nProbeSuper×cellsPerSuper`
    * dots instead of `numCells` — ~2√C at a balanced split. MEASURED at
    * the same 2M×64 bracket (AnnAssignCostProbe ASSIGN2 arms, r18.5):
    * 10240 flat-equivalent cells assign in 13.8 s as 128×80 (61× under
    * the flat 841 s) and 22.3 s as 32×320; 4096-equivalent in 9.4 s as
    * 64×64 (flat: 364.6 s) — and the dots/row model lands within 3%
    * (208 dots for 128×80 vs the flat-128 reference's 128 → predicted
    * 1.63×, read 1.68×). The price is hierarchical assignment: a
    * vector near a super-cell boundary may land in a different flat cell
    * than a flat quantizer would put it (classic hierarchical-IVF
    * recall trade; `nProbeSuper` is the query-side recovery lever, and
    * the degenerate `numSuper=1` case is BIT-IDENTICAL to the flat
    * quantizer — spec-pinned, tying this path to the gated one). The
    * trade MEASURED at the 10× bracket (TwoLevelRecallProbe, 200k×64):
    * on STRUCTURELESS data at a matched 0.5 probed fraction, 8×8
    * two-level reads 0.776 (nProbeSuper=4) / 0.880 (=8) vs flat 0.944 —
    * the boundary effect's worst case, because i.i.d. super-cells are
    * arbitrary; on CLUSTERED data (200 planted centers — the regime
    * fine cells exist for) it nearly vanishes: 0.984 vs flat 1.000 at a
    * 0.125 fraction. Use this quantizer where it belongs — clustered
    * corpora needing >4k cells — not as a drop-in at flat-affordable
    * cell counts.
    *
    * Flat cell ids pack densely: cell (s, j) → `offsets(s) + j`, so
    * everything downstream (sub-sharding, shard keys, graph build,
    * beam) is the unchanged gated machinery.
    */
  final case class TwoLevelQuantizer(
      l1: Array[Array[Double]],
      l2: Array[Array[Array[Double]]],
      nProbeSuper: Int) extends CoarseQuantizer {
    require(l1.nonEmpty && l2.length == l1.length &&
      nProbeSuper > 0 && nProbeSuper <= l1.length,
      "TwoLevelQuantizer: l2 must have one child set per super-centroid " +
        "and nProbeSuper must be in [1, numSuper]")
    val offsets: Array[Int] = l2.scanLeft(0)(_ + _.length).init
    def numCells: Int = offsets.last + l2.last.length
    def assign(vn: Array[Double]): Int = {
      val s = nearestCell(vn, l1)
      offsets(s) + nearestCell(vn, l2(s))
    }
    def route(vn: Array[Double], nProbeCells: Int): Array[Int] = {
      val supers = routeCells(vn, l1, nProbeSuper)
      val cands = supers.flatMap { s =>
        val children = l2(s)
        children.indices.map { j =>
          val ct = children(j)
          var dot = 0.0; var i = 0
          while (i < ct.length) { dot += vn(i) * ct(i); i += 1 }
          (offsets(s) + j, dot)
        }
      }
      // the candidate pool is ONLY the probed supers' children (r18
      // ADVICE): a nProbeCells above it would silently probe fewer cells
      // than asked — fail loud; nProbeSuper is the lever that widens it.
      // (dim-0 children of empty super-cells rank at dot 0.0 — the SAME
      // empty-cell rule as the flat trainer's Array.empty cells, kept
      // identical so numSuper=1 stays bit-for-bit the flat path.)
      require(nProbeCells <= cands.length,
        s"TwoLevelQuantizer.route: nProbeCells=$nProbeCells exceeds the " +
          s"probed pool of ${cands.length} cells (nProbeSuper=$nProbeSuper " +
          "supers' children) — raise nProbeSuper to widen the pool")
      cands.sortBy { case (c, d) => (-d, c) }.take(nProbeCells).map(_._1)
    }
  }

  /** Trains a [[TwoLevelQuantizer]]: the SAME bounded deterministic
    * sample and Lloyd fold as [[trainIvfCentroids]] (so `numSuper=1`
    * degenerates to the flat trainer exactly), first over `numSuper`
    * super-centroids, then per super-cell over its sample members for
    * `cellsPerSuper` children. A super-cell with no sample members keeps
    * dim-0 children (every dot scores 0.0 — deterministic, same effect
    * as the flat trainer's zero-vector empty-cell rule) — it can still
    * be routed to, it just attracts nothing.
    *
    * SCALE `trainCap` WITH THE TARGET CELL COUNT (r18 ADVICE): the one
    * global sample splits across supers, so at the quantizer's advertised
    * regime (>4k flat-equivalent cells) the default 4096 leaves each
    * super ~32 rows to train 80 children — most children start as
    * duplicate/dim-0 centroids and the EFFECTIVE cell count collapses far
    * below the flat-equivalent the cell arithmetic quotes. Floor: ≥8
    * sample rows per CHILD, i.e. `trainCap ≥ 8 × numSuper ×
    * cellsPerSuper` (a 128×80 target wants ~80k; the default suits ≤512
    * total cells). The default stays at the flat trainer's 4096 so the
    * `numSuper=1` degeneracy is exact at matching caps.
    */
  def trainIvfCentroidsTwoLevel(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      numSuper: Int,
      cellsPerSuper: Int,
      nProbeSuper: Int,
      lloydIters: Int = 2,
      trainCap: Int = 4096): TwoLevelQuantizer = {
    require(numSuper > 0 && cellsPerSuper > 0,
      "trainIvfCentroidsTwoLevel: numSuper and cellsPerSuper must be positive")
    val sample = trainingSample(embeddings, idCol, vecCol, trainCap)
    val l1 = trainIvfCentroidsFromSample(sample, numSuper, lloydIters)
    val bySuper = sample.groupBy { case (_, vn) => nearestCell(vn, l1) }
    val l2 = Array.tabulate(numSuper) { s =>
      trainIvfCentroidsFromSample(
        bySuper.getOrElse(s, Array.empty[(Long, Array[Double])]),
        cellsPerSuper, lloydIters)
    }
    TwoLevelQuantizer(l1, l2, nProbeSuper)
  }

  /** [[hnswRoutedTopK]] under a [[TwoLevelQuantizer]] — the transient
    * routed probe for cell counts past the flat quantizer's measured
    * ~4k-cell assignment cliff. Downstream of routing/assignment the
    * machinery is byte-identical to the gated flat path (shared core),
    * and the `numSuper=1` degenerate case IS the flat path, spec-pinned.
    * Standing-index integration is deliberately deferred until a shipped
    * config needs >4k cells (shipped: 64–128).
    */
  def hnswRoutedTopKTwoLevel(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      quantizer: TwoLevelQuantizer,
      nProbeCells: Int,
      m: Int = 16,
      ef: Int = 128,
      maxShardRows: Int = 16384,
      maxQueries: Int = 4096): DataFrame =
    hnswRoutedTopKQuantized(embeddings, idCol, vecCol, queryPred, k,
      nProbeCells, m, ef, maxShardRows, maxQueries, quantizer)

  private def hnswRoutedTopKQuantized(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nProbeCells: Int,
      m: Int,
      ef: Int,
      maxShardRows: Int,
      maxQueries: Int,
      quantizer: CoarseQuantizer): DataFrame = {
    require(nProbeCells > 0 && maxShardRows > 0 && maxQueries > 0,
      "hnswRoutedTopKWithCentroids: nProbeCells, maxShardRows and " +
        "maxQueries must be positive")
    val spark = embeddings.sparkSession
    import spark.implicits._

    def prep(df: DataFrame) =
      ivfPrep(df, idCol, vecCol).map { case (id, _, _, vn) => (id, vn) }

    // same collected-query contract as hnswTopK (zero-norm vectors kept:
    // they rank nowhere after exactRerank's nrm > 0 guard, as there)
    val overCap = prep(embeddings.where(queryPred)).take(maxQueries + 1)
    require(overCap.length <= maxQueries,
      s"hnswRoutedTopK: queryPred matched more than maxQueries=$maxQueries " +
        "rows; the routed probe broadcasts the full query set — narrow the " +
        "predicate, chunk the queries, or raise maxQueries deliberately.")
    val queries = overCap.sortBy(_._1)

    // driver-side routing: queries ≤ maxQueries × numCells dots, bounded
    val routes: Map[Int, Array[Int]] = queries.zipWithIndex
      .flatMap { case ((_, qv), qi) =>
        quantizer.route(qv, nProbeCells).map(c => (c, qi))
      }
      .groupBy(_._1).map { case (c, qs) => c -> qs.map(_._2).sorted }
    val routedCells: Set[Int] = routes.keySet

    val quantB = spark.sparkContext.broadcast(quantizer)
    val routedCellsB = spark.sparkContext.broadcast(routedCells)
    // only routed cells cross the exchange: a transient probe never pays
    // for cells no query visits. r20 (guide §5 persist-when-reused): the
    // assigned frame feeds TWO consumers — the counts action below and
    // the shard-build job — and each consumption re-ran scan + normalize
    // + quantizer assignment (numCells dots per row; ~7-15 s/pass at the
    // sf100 bracket). It now persists for exactly the span of this call:
    // the candidate rows (bounded by queries × probed shards × k — ids
    // only, never vectors) are materialized EAGERLY via localCheckpoint
    // and the assigned blocks are dropped in a finally, so no corpus-
    // sized cache outlives the call (the ivfTopKWithCentroids leak
    // adjudication is honored by eagerness rather than by recompute).
    // The checkpointed candidate blocks live until the returned frame is
    // GC'd (ContextCleaner) — the same lifetime the components family's
    // eager actions already rely on. Like every localCheckpoint in this
    // library, the blocks are executor-local: a lost executor fails the
    // consumer instead of recomputing (fine on local[N]; cluster callers
    // wanting fault tolerance persist the embeddings themselves and
    // re-probe).
    val assigned = prep(embeddings)
      .map { case (id, vn) => (quantB.value.assign(vn), id, vn) }
      .filter { case (cell, _, _) => routedCellsB.value.contains(cell) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = try {
      // cell sizes → sub-shard factors (≤ numCells rows collected); a
      // cell's count is unaffected by dropping OTHER cells, so the dump
      // (which counts the full corpus) derives identical factors for
      // routed cells
      val cellCounts: Map[Int, Long] = assigned
        .groupByKey { case (cell, _, _) => cell }.count().collect().toMap
      val subFactors: Map[Int, Int] = cellCounts.map { case (c, n) =>
        c -> routedSubFactorOf(n, maxShardRows) // 2^20 bound enforced inside
      }
      val subFactorsB = spark.sparkContext.broadcast(subFactors)
      val queriesB = spark.sparkContext.broadcast(queries)
      val routesB = spark.sparkContext.broadcast(routes)
      val kk = k; val mm = m; val eff = ef; val cap = maxShardRows

      assigned
        .groupByKey { case (cell, id, _) =>
          routedShardKey(cell, routedSubOf(id, subFactorsB.value(cell)))
        }
        .flatMapGroups { (key, it) =>
          val cell = (key >>> 20).toInt
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
          it.foreach { case (_, id, vn) =>
            buf += ((id, vn))
            require(buf.length <= 8L * cap,
              s"hnswRoutedTopK: sub-shard for cell $cell exceeds 8x " +
                s"maxShardRows=$cap — the hash spread degenerated (adversarial " +
                "ids?); raise maxShardRows or investigate the id space")
          }
          val g = buildShardGraph(buf.toArray, mm, eff).freeze(key, cell)
          val qs = routesB.value(cell) // key exists: corpus filtered to routed cells
          qs.iterator.flatMap { qi =>
            val (qid, qv) = queriesB.value(qi)
            searchFrozen(g, qv, qid, kk, eff).iterator
              .map { case (nid, _) => (qid, nid) }
          }
        }
        .toDF("query_id", "neighbor_id")
        .localCheckpoint(true) // eager: both assigned passes happen HERE
    } finally assigned.unpersist()

    exactRerank(candidates, embeddings, idCol, vecCol, k)
  }

  /** The routed-HNSW trained artifact: routing centroids + one dump per
    * (cell, sub-shard) graph, densely indexed — what the gate's oracle
    * embeds as literals. `shardCells(i)` is the cell of `dumps(i)`. */
  final case class HnswRoutedDump(
      cents: Array[Array[Double]],
      shardCells: Array[Int],
      dumps: Array[HnswShardDump])

  /** Driver-side rebuild of [[hnswRoutedTopK]]'s exact artifact (the
    * [[hnswIndexDump]] contract applied to the routed layout): trains the
    * same centroids, assigns the collected corpus with the same
    * arithmetic, derives the same sub-shard factors from FULL cell counts
    * (identical to the production values — a cell's count doesn't depend
    * on other cells), and builds every cell's graphs so the artifact is
    * query-independent; the oracle's routing CTE decides which graphs a
    * query walks. ORACLE-DUMP HELPER ONLY — fail-fast above `maxRows`.
    */
  def hnswRoutedIndexDump(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int = 8,
      m: Int = 8,
      ef: Int = 64,
      maxShardRows: Int = 64,
      lloydIters: Int = 2,
      trainCap: Int = 4096,
      maxRows: Int = 100000): HnswRoutedDump =
    hnswRoutedIndexDumpWithCentroids(embeddings, idCol, vecCol,
      trainIvfCentroids(embeddings, idCol, vecCol, numCells, lloydIters,
        trainCap),
      m, ef, maxShardRows, maxRows)

  /** [[hnswRoutedIndexDump]] under caller-supplied centroids — the
    * maintenance-gate seam: the `ann_hnsw_index_compact` oracle needs
    * graphs over the SURVIVING corpus at the FULL-corpus quantizer
    * (a compacted index keeps its standing centroids), which no
    * self-training dump can produce. ORACLE-DUMP HELPER ONLY — same
    * fail-fast row cap.
    */
  def hnswRoutedIndexDumpWithCentroids(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Double]],
      m: Int = 8,
      ef: Int = 64,
      maxShardRows: Int = 64,
      maxRows: Int = 100000): HnswRoutedDump = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val over = ivfPrep(embeddings, idCol, vecCol)
      .map { case (id, _, _, vn) => (id, vn) }
      .take(maxRows + 1)
    require(over.length <= maxRows,
      s"hnswRoutedIndexDump: corpus exceeds maxRows=$maxRows rows; this " +
        "helper rebuilds the routed shard graphs on the driver for the " +
        "oracle dump and is not a production probe.")
    val byCell = over.groupBy { case (_, vn) => nearestCell(vn, cents) }
    val shards = byCell.toArray.sortBy(_._1).flatMap { case (cell, rows) =>
      val factor = routedSubFactorOf(rows.length.toLong, maxShardRows)
      rows.groupBy { case (id, _) => routedSubOf(id, factor) }
        .toArray.sortBy(_._1)
        .map { case (_, subRows) => (cell, subRows) }
    }
    HnswRoutedDump(
      cents,
      shards.map(_._1),
      shards.zipWithIndex.map { case ((_, rows), i) =>
        buildShardGraph(rows, m, ef).dump(i)
      })
  }

  /** Decision inputs for the routed-vs-full-fan-out HNSW choice — the
    * [[graft.text.Dedup.RouteStats]] pattern applied to the ANN axis:
    * ONE cheap pass (the bounded trainer + the query batch's own routing
    * assignment, which the routed path computes anyway) yields the
    * quantity the measured regime boundary actually turns on — the
    * PROBED-CELL UNION of the query batch. When the union approaches
    * `numCells`, routing shuffles and builds (almost) the whole corpus
    * anyway and its trainer + assignment passes are pure overhead (the
    * 10× bracket measured routed 133.9 s vs full fan-out 96.7 s at 50
    * diverse queries); when the union stays well under `numCells` (small
    * or clustered query batches) only the probed fraction is built and
    * routing wins (69.0 vs 91.4 s at 5 queries on the 100× clustered
    * bracket). `corpusRows`/`fanoutShards` record the fan-out arm the
    * decision compares against ([[hnswShardsFor]]).
    */
  final case class HnswRouteStats(
      nQueries: Int,
      numCells: Int,
      probedUnionCells: Int,
      corpusRows: Long,
      fanoutShards: Int,
      cents: Array[Array[Double]]) {
    def unionFraction: Double =
      if (numCells <= 0) 1.0 else probedUnionCells.toDouble / numCells
    /** Two measured win conditions (see [[RoutedUnionCutover]] /
      * [[RoutedGranularityMargin]] for the evidence): the QUERY-side win
      * (small probed union ⇒ only a fraction of the corpus is built) and
      * the GRANULARITY win (cells much finer than the hash shards ⇒ even
      * a full-union routed build pays superlinear insert on smaller
      * graphs and comes out ahead of fan-out's coarser shards).
      */
    def useRouted(
        cutover: Double = RoutedUnionCutover,
        granularityMargin: Int = RoutedGranularityMargin): Boolean =
      unionFraction <= cutover ||
        (fanoutShards > 0 && numCells >= granularityMargin * fanoutShards)
  }

  /** The insert-vs-rebuild cutover on the CELLS-HIT fraction of an
    * [[HnswRoutedIndex.insert]] batch — measured at the 2M bracket
    * (HnswIndexMaintenanceProbe): at 0.39 coverage (32 structureless
    * rows over 64 cells) partial rebuild reads 0.28× of a fresh build;
    * at 1.0 coverage it reads 1.31× (frozen-shard rereads beat a
    * parquet scan + assignment only when most shards are SKIPPED).
    * Biased high like the other cutovers: the partial path's worst case
    * is bounded (~1.3×), the rebuild path's worst case at low coverage
    * is the whole build.
    */
  val InsertRebuildCutover: Double = 0.75

  /** The measured routed-vs-fan-out crossover on the probed-union
    * fraction (RECALL_SF10DUP.json, regenerated r18): routing wins when
    * the union stays well under numCells (5-query clustered batches at
    * the 2M bracket probe ~⅓ of cells: 69.0 vs 91.4 s), loses when the
    * union re-covers the corpus AND the cells are no finer than the hash
    * shards (50 diverse queries at 2M, 64 cells vs 123 shards: 133.9 vs
    * 96.7 s). The cutover sits between the measured brackets, biased
    * HIGH because routing's worst case is the bounded trainer +
    * assignment overhead (~1.4× at full union) while fan-out's worst
    * case at serving time is unbounded shard fan-out — the same
    * bounded-worst-case bias as the dedup doc cutover.
    */
  val RoutedUnionCutover: Double = 0.75

  /** The second measured term: at FULL probed union, routed still wins
    * when its cells are ≥ this factor finer than [[hnswShardsFor]]'s
    * shards — HNSW insert is superlinear in graph size, so 64 cells of
    * ~3.1k rows beat 32 hash shards of 6.25k at the 10× bracket (18.0 vs
    * 21.9 s, full union) even after the trainer + two assignment passes.
    * The margin of 2 keeps the claim conservative: at ~equal granularity
    * the overhead decides (the 100× bracket, 128 cells vs 123 shards,
    * measured a 2% routed edge — inside noise, and the rule's fan-out
    * pick there costs that 2% in exchange for never paying the overhead
    * on corpora where the granularities tie).
    */
  val RoutedGranularityMargin: Int = 2

  /** [[HnswRouteStats]] for a corpus + query batch: trains the coarse
    * quantizer (bounded, deterministic — reused by the routed branch via
    * [[hnswAutoTopKFromStats]], so deciding never trains twice), collects
    * the bounded query set, and takes the union of every query's top
    * `nProbeCells` routing cells. `cores` sizes the fan-out arm
    * ([[hnswShardsFor]]); 0 = the session's default parallelism.
    */
  def hnswRouteStats(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      numCells: Int = 64,
      nProbeCells: Int = 32,
      maxQueries: Int = 4096,
      lloydIters: Int = 2,
      trainCap: Int = 4096,
      cores: Int = 0): HnswRouteStats = {
    require(numCells > 0 && nProbeCells > 0 && maxQueries > 0)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = trainIvfCentroids(
      embeddings, idCol, vecCol, numCells, lloydIters, trainCap)
    val overCap = ivfPrep(embeddings.where(queryPred), idCol, vecCol)
      .map { case (id, _, _, vn) => (id, vn) }
      .take(maxQueries + 1)
    require(overCap.length <= maxQueries,
      s"hnswRouteStats: queryPred matched more than maxQueries=$maxQueries " +
        "rows; both HNSW arms broadcast the full query set — narrow the " +
        "predicate, chunk the queries, or raise maxQueries deliberately.")
    val union = overCap.iterator
      .flatMap { case (_, qv) => routeCells(qv, cents, nProbeCells) }
      .toSet.size
    val rows = embeddings.count()
    val c = if (cores > 0) cores else spark.sparkContext.defaultParallelism
    HnswRouteStats(overCap.length, numCells, union, rows,
      hnswShardsFor(rows, c), cents)
  }

  /** Auto-routed HNSW top-k (r17 verdict ask #1): ONE cheap stats pass
    * ([[hnswRouteStats]]) picks the plan — [[hnswRoutedTopK]] when
    * either measured win condition holds (the query batch's probed-cell
    * union stays under the cutover fraction of `numCells`, so only that
    * fraction of the corpus is shuffled and built; or the cells are ≥
    * [[RoutedGranularityMargin]]× finer than the hash shards, so even a
    * full-union routed build wins on superlinear insert) — [[hnswTopK]]
    * at corpus-adaptive [[hnswShardsFor]] shards otherwise (diverse
    * batches over granularity-tied layouts re-cover the corpus, and
    * routing's trainer + assignment passes buy nothing). Both branches
    * share this family's query contract (collected + broadcast query
    * set, `maxQueries` fail-fast) and exact re-rank arithmetic. Callers
    * who want the decision inputs recorded (the bench envelopes do) call
    * the two halves explicitly.
    */
  def hnswAutoTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      numCells: Int = 64,
      nProbeCells: Int = 32,
      m: Int = 16,
      ef: Int = 128,
      maxShardRows: Int = 16384,
      maxQueries: Int = 4096,
      lloydIters: Int = 2,
      trainCap: Int = 4096,
      cores: Int = 0,
      cutover: Double = RoutedUnionCutover): DataFrame =
    hnswAutoTopKFromStats(embeddings, idCol, vecCol, queryPred, k,
      nProbeCells, m, ef, maxShardRows, maxQueries,
      hnswRouteStats(embeddings, idCol, vecCol, queryPred, numCells,
        nProbeCells, maxQueries, lloydIters, trainCap, cores),
      cutover)

  /** [[hnswAutoTopK]] with the decision inputs already computed — the
    * seam the bench envelopes use to RECORD the decision (the dedup
    * `route_stats` artifact pattern) without training twice: the routed
    * branch reuses `stats.cents`, the fan-out branch `stats.fanoutShards`.
    */
  def hnswAutoTopKFromStats(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nProbeCells: Int,
      m: Int,
      ef: Int,
      maxShardRows: Int,
      maxQueries: Int,
      stats: HnswRouteStats,
      cutover: Double = RoutedUnionCutover): DataFrame =
    if (stats.useRouted(cutover))
      hnswRoutedTopKWithCentroids(embeddings, idCol, vecCol, queryPred, k,
        nProbeCells, m, ef, maxShardRows, maxQueries, stats.cents)
    else
      hnswTopK(embeddings, idCol, vecCol, queryPred, k,
        numShards = stats.fanoutShards, m = m, ef = ef,
        maxQueries = maxQueries)

  /** A STANDING routed-HNSW index (r17 verdict ask #3 — the explicit
    * lifecycle that replaces the transient path's no-persist
    * adjudication): [[buildHnswRoutedIndex]] assigns and builds EVERY
    * cell's graphs ONCE (query-independent, eagerly materialized) and
    * persists the frozen shards MEMORY_AND_DISK; each [[topK]] batch then
    * pays only routing + the beam searches over its probed cells' already-
    * built graphs — the amortization that keeps routing's per-query
    * fan-out win at ANY batch size (the transient path loses it on large
    * diverse batches because every batch re-pays trainer + assignment +
    * build). [[release]] is the unpersist hook whose absence forced the
    * transient adjudication, and [[save]]/[[loadHnswRoutedIndex]] (r19)
    * extend the lifetime past the session: the shard graphs round-trip
    * through Parquet bit-identically, so a restart pays a read, not the
    * rebuild.
    *
    * Output contract: for the same (corpus, config, query batch), [[topK]]
    * equals [[hnswRoutedTopK]] exactly (same trainer, assignment,
    * hash-spread sub-sharding, graph build, routing, beam, re-rank —
    * spec-pinned), so the `ann_hnsw_index` gate hash-matches the routed
    * oracle.
    */
  final class HnswRoutedIndex private[ann] (
      corpus: DataFrame,
      val idCol: String,
      val vecCol: String,
      private[ann] val quantizer: CoarseQuantizer,
      val m: Int,
      val ef: Int,
      val maxShardRows: Int,
      val numShards: Long,
      private[ann] val shards: org.apache.spark.sql.Dataset[FrozenShard],
      removed: Option[Column]) {

    /** The standing routing centroids when the index runs the flat
      * quantizer (every gate config). Two-level indexes
      * ([[buildHnswRoutedIndexTwoLevel]]) have no flat matrix — ask for
      * [[quantizer]] inside the package instead.
      */
    def cents: Array[Array[Double]] = quantizer match {
      case FlatQuantizer(c) => c
      case _ => throw new IllegalStateException(
        "HnswRoutedIndex.cents: this index runs a two-level quantizer — " +
          "there is no flat centroid matrix")
    }

    /** True when `other` serves the SAME persisted shards Dataset — the
      * aliasing [[remove]] (always) and a no-tombstone-hit [[compact]]
      * create by design (tombstoning is free; no graphs are copied).
      * [[release]] on either aliased index unpersists both, so lifecycle
      * owners (e.g. the streaming maintenance loop) must check this
      * before releasing a superseded generation.
      */
    def sharesShardsWith(other: HnswRoutedIndex): Boolean =
      shards eq other.shards

    /** The relation this index currently serves: the corpus minus any
      * pending [[remove]] tombstones. Queries are drawn from it and
      * candidates re-ranked against it, so tombstoned rows can neither
      * ask nor answer — the graphs still contain them until [[compact]].
      */
    private def served: DataFrame =
      removed.fold(corpus)(r => corpus.where(not(r)))

    /** Top-k neighbors for the corpus rows matching `queryPred`, served
      * from the standing graphs: routes each query to its `nProbeCells`
      * nearest cells (the shared IVF probe rule), beam-searches only the
      * persisted shards of probed cells, exact-reranks survivors.
      */
    def topK(
        queryPred: Column,
        k: Int,
        nProbeCells: Int,
        maxQueries: Int = 4096): DataFrame = {
      require(nProbeCells > 0 && maxQueries > 0,
        "HnswRoutedIndex.topK: nProbeCells and maxQueries must be positive")
      val spark = shards.sparkSession
      import spark.implicits._
      val overCap = ivfPrep(served.where(queryPred), idCol, vecCol)
        .map { case (id, _, _, vn) => (id, vn) }
        .take(maxQueries + 1)
      require(overCap.length <= maxQueries,
        s"HnswRoutedIndex.topK: queryPred matched more than " +
          s"maxQueries=$maxQueries rows; queries are broadcast — narrow " +
          "the predicate, chunk the queries, or raise maxQueries " +
          "deliberately.")
      val queries = overCap.sortBy(_._1)
      val localQuant = quantizer
      val routes: Map[Int, Array[Int]] = queries.zipWithIndex
        .flatMap { case ((_, qv), qi) =>
          localQuant.route(qv, nProbeCells).map(c => (c, qi))
        }
        .groupBy(_._1).map { case (c, qs) => c -> qs.map(_._2).sorted }
      val routedCellsB = spark.sparkContext.broadcast(routes.keySet)
      val routesB = spark.sparkContext.broadcast(routes)
      val queriesB = spark.sparkContext.broadcast(queries)
      val kk = k; val eff = ef
      val candidates = shards
        .filter((fs: FrozenShard) => routedCellsB.value.contains(fs.cell))
        .flatMap { fs =>
          val qs = routesB.value(fs.cell)
          qs.iterator.flatMap { qi =>
            val (qid, qv) = queriesB.value(qi)
            searchFrozen(fs, qv, qid, kk, eff).iterator
              .map { case (nid, _) => (qid, nid) }
          }
        }
        .toDF("query_id", "neighbor_id")
      exactRerank(candidates, served, idCol, vecCol, k)
    }

    /** Incremental insert — the maintenance half of the standing-index
      * story: a 100 TB corpus grows continuously, and rebuilding every
      * cell graph per arriving batch would forfeit the amortization the
      * index exists for. New rows are assigned to the STANDING centroids
      * (the quantizer is part of the index's identity — retraining would
      * silently re-route the whole corpus), and only the sub-shards that
      * actually receive a new id are rebuilt, from the frozen shards'
      * own (id, vector) payload — unaffected cells are never touched and
      * the base corpus is never re-scanned. When a cell's growth crosses
      * a `maxShardRows` boundary its sub-shard factor changes, so that
      * whole cell reshards (layout invariant: factor =
      * [[routedSubFactorOf]] of the CURRENT cell count — the same value
      * a fresh build over the union would derive).
      *
      * Output contract (spec-pinned, and what the `ann_hnsw_index_inc`
      * gate hash-checks against the routed oracle): because shard builds
      * are deterministic in the row set (ascending-id insertion,
      * hash-derived levels) and sub-shard membership is id-deterministic,
      * the inserted index is BIT-IDENTICAL to
      * [[buildHnswRoutedIndexWithCentroids]] over the unioned corpus with
      * the same centroids — insert-then-query and rebuild-then-query
      * cannot drift.
      *
      * `newRows` must carry every corpus column (queries predicate over
      * the corpus schema) and ids disjoint from the standing corpus — the
      * primary-key contract that also underwrites the sub-shard hash
      * spread. The disjointness check is one semi-join over the corpus
      * ids; `checkIds = false` skips it when upstream already guarantees
      * it (e.g. a monotone id allocator) — at 100 TB that scan is the
      * dominant cost of a small insert.
      *
      * MEASURED boundary, productized (HnswIndexMaintenanceProbe, 2M×64,
      * 64 cells): a 32-row insert costs 0.28× of a rebuild (46.4 vs
      * 168.3 s — the cells-hit model), but a 1024-row STRUCTURELESS
      * insert read 220.4 s on the partial path — worse than the
      * rebuild — because every cell was hit and partial rebuild
      * degenerates to a rebuild plus its overheads. Insert therefore
      * DECIDES: when the batch's cells-hit fraction reaches
      * [[InsertRebuildCutover]], it takes the rebuild inputs (parquet
      * scan + assignment at the STANDING centroids) instead of
      * frozen-shard rereads. Both paths are bit-identical (this
      * contract), so the cutover is invisible to gates and specs — it
      * only picks the cheaper inputs.
      *
      * Returns a NEW index, eagerly materialized (build cost is paid
      * here, as in [[buildHnswRoutedIndex]]). The old index stays
      * serviceable until its own [[release]]; the new index's kept
      * shards are persisted independently, so releasing the old one
      * afterwards only costs lineage recompute if the new blocks are
      * later evicted. Pending [[remove]] tombstones carry over.
      */
    def insert(newRows: DataFrame, checkIds: Boolean = true): HnswRoutedIndex = {
      val missing = corpus.columns.filterNot(newRows.columns.contains)
      require(missing.isEmpty,
        s"HnswRoutedIndex.insert: newRows lacks corpus column(s) " +
          s"${missing.mkString(", ")} — the served relation is the union, " +
          "so every corpus column must be present")
      if (checkIds) {
        val clash = corpus.select(col(idCol))
          .join(newRows.select(col(idCol)), Seq(idCol))
        require(clash.isEmpty,
          "HnswRoutedIndex.insert: newRows shares ids with the standing " +
            "corpus — ids are the primary key (routing, sub-shard spread, " +
            "self-exclusion all key on them); pass checkIds = false only " +
            "when upstream guarantees disjointness")
      }
      val spark = shards.sparkSession
      import spark.implicits._
      val centsB = spark.sparkContext.broadcast(quantizer)
      // r19 (guide §5): newAssigned has THREE consumers (cell counts,
      // rebuild-key derivation, the rebuild rows) and each re-ran the
      // batch scan + assignment; one persist bounded by the batch size
      // pays it once, dropped before insert returns on every path.
      val newAssigned = ivfPrep(newRows, idCol, vecCol)
        .map { case (id, _, _, vn) => (centsB.value.assign(vn), id, vn) }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
      val newCellCounts: Map[Int, Long] = newAssigned
        .groupByKey { case (cell, _, _) => cell }.count().collect().toMap
      if (newCellCounts.isEmpty) return this
      val oldCellCounts: Map[Int, Long] = shards
        .map(fs => (fs.cell, fs.ids.length.toLong))
        .groupByKey(_._1).mapGroups((c, it) => (c, it.map(_._2).sum))
        .collect().toMap
      // insert-vs-rebuild cutover, MEASURED (HnswIndexMaintenanceProbe,
      // 2M×64): when a batch hits most cells, the partial-rebuild
      // machinery degenerates to a rebuild plus its overheads (a
      // structureless 1024-row insert read 220.4 s vs the 168.3 s fresh
      // build — frozen-shard rereads cost more than a parquet scan +
      // assignment at full coverage), while a 32-row insert reads 0.28×
      // of the build. Output is bit-identical on BOTH paths (the insert
      // contract), so the cutover is invisible to gates and specs — it
      // only picks the cheaper inputs. Decision inputs are already here:
      // cells hit vs cells standing.
      val hitCells = newCellCounts.keySet
      val allCells = oldCellCounts.keySet ++ hitCells
      if (hitCells.size.toDouble / allCells.size >= InsertRebuildCutover) {
        val unionCorpus =
          corpus.union(newRows.select(corpus.columns.map(col).toSeq: _*))
        // r19 (guide §5): counts + build shared one assignment pass —
        // same persist treatment as buildHnswRoutedIndexWithQuantizer
        val assignedAll = ivfPrep(unionCorpus, idCol, vecCol)
          .map { case (id, _, _, vn) =>
            (centsB.value.assign(vn), id, vn)
          }
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val counts: Map[Int, Long] = assignedAll
            .groupByKey { case (c, _, _) => c }.count().collect().toMap
          val subF = counts.map { case (c, n) =>
            c -> routedSubFactorOf(n, maxShardRows)
          }
          val next = buildFrozenShards(assignedAll, subF, m, ef, maxShardRows,
            "HnswRoutedIndex.insert(rebuild)")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val n = next.count()
          return new HnswRoutedIndex(unionCorpus, idCol, vecCol, quantizer, m,
            ef, maxShardRows, n, next, removed)
        } finally assignedAll.unpersist()
      }
      // layout invariant: the standing factor is always derivable from the
      // standing count, so "did this insert change the layout?" is pure
      // driver arithmetic over ≤ numCells entries
      val nextSub: Map[Int, Int] =
        (oldCellCounts.keySet ++ newCellCounts.keySet).iterator.map { c =>
          val n = oldCellCounts.getOrElse(c, 0L) + newCellCounts.getOrElse(c, 0L)
          c -> routedSubFactorOf(n, maxShardRows)
        }.toMap
      val resharded: Set[Int] = newCellCounts.keySet.filter { c =>
        val oldSub = oldCellCounts.get(c)
          .map(n => routedSubFactorOf(n, maxShardRows))
        !oldSub.contains(nextSub(c)) // factor flipped, or a brand-new cell
      }
      val reshardedB = spark.sparkContext.broadcast(resharded)
      val nextSubB = spark.sparkContext.broadcast(nextSub)
      // stable cells rebuild ONLY the sub-shards a new id lands in —
      // distinct keys, bounded by the shard count
      val rebuildKeys: Set[Long] = newAssigned
        .filter { case (cell, _, _) => !reshardedB.value.contains(cell) }
        .map { case (cell, id, _) =>
          routedShardKey(cell, routedSubOf(id, nextSubB.value(cell)))
        }
        .distinct().collect().toSet
      val rebuildKeysB = spark.sparkContext.broadcast(rebuildKeys)
      val oldRebuildRows = shards
        .filter(fs => reshardedB.value.contains(fs.cell) ||
          rebuildKeysB.value.contains(fs.key))
        .flatMap(fs => fs.ids.iterator.zip(fs.vecs.iterator)
          .map { case (id, vn) => (fs.cell, id, vn) })
      val rebuilt = buildFrozenShards(oldRebuildRows.union(newAssigned),
        nextSub, m, ef, maxShardRows, "HnswRoutedIndex.insert")
      val kept = shards.filter(fs => !reshardedB.value.contains(fs.cell) &&
        !rebuildKeysB.value.contains(fs.key))
      val next = kept.union(rebuilt)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = next.count() // materialize: insert cost is paid at insert time
      val nextCorpus = corpus.union(newRows.select(corpus.columns.map(col).toSeq: _*))
      new HnswRoutedIndex(nextCorpus, idCol, vecCol, quantizer, m, ef,
        maxShardRows, n, next, removed)
      } finally newAssigned.unpersist()
    }

    /** [[insert]] minus rows whose ids already stand — already-indexed
      * ids are SKIPPED, not replaced. This is the idempotent form a
      * streaming ingest loop needs: `foreachBatch` is at-least-once, so
      * a replayed micro-batch must land as a no-op instead of tripping
      * the primary-key fail (the anti-join replaces `checkIds`, at the
      * same one-semi-join cost). See
      * [[graft.streaming.StreamingOps.streamingAnnIngest]].
      *
      * Duplicate ids WITHIN the batch are collapsed too (r18 ADVICE):
      * at-least-once delivery and upstream dup rows routinely repeat an
      * id inside one micro-batch, and letting both copies through
      * `checkIds = false` would silently break the primary-key contract
      * that sub-shard spread, self-exclusion, and exact re-rank key on.
      * The collapse is value-deterministic in the at-least-once case
      * (replayed copies are identical rows, so any survivor is THE row);
      * distinct payloads under one id are a caller contract violation —
      * an arbitrary copy wins, exactly as `dropDuplicates` documents.
      */
    def insertNew(newRows: DataFrame): HnswRoutedIndex = {
      val fresh = newRows.dropDuplicates(idCol)
        .join(corpus.select(col(idCol)), Seq(idCol), "left_anti")
      insert(fresh, checkIds = false)
    }

    /** Tombstone delete: rows matching `pred` leave the SERVED relation
      * immediately — they can no longer appear as queries or neighbors
      * (the re-rank joins against the served corpus, so a tombstoned
      * beam candidate drops there) — but the standing graphs keep them
      * as routing waypoints until [[compact]]. Free at remove time;
      * the costs until compaction are (a) beam slots spent on candidates
      * that then drop (a query can return fewer than k when tombstones
      * crowd its neighborhood — ef headroom covers scattered deletes)
      * and (b) the predicate filter on every query batch. Composes:
      * successive removes OR together.
      *
      * The returned index SHARES this one's persisted shards (nothing is
      * copied — that is what makes remove free): [[release]] on either
      * unpersists both. [[sharesShardsWith]] is the ownership check.
      */
    def remove(pred: Column): HnswRoutedIndex =
      new HnswRoutedIndex(corpus, idCol, vecCol, quantizer, m, ef,
        maxShardRows, numShards, shards, removed.map(_ || pred).orElse(Some(pred)))

    /** Rebuilds exactly the sub-shards holding tombstoned rows (cells
      * whose shrunken count crosses a `maxShardRows` boundary reshard
      * whole, the [[insert]] layout invariant in reverse), drops the
      * tombstones from the corpus, and returns a clean index. Same
      * bit-identity contract as insert: the compacted index equals
      * [[buildHnswRoutedIndexWithCentroids]] over the surviving corpus
      * with the standing centroids — spec-pinned. No-op without pending
      * tombstones; a predicate matching no standing row just clears —
      * and in that no-hit case the returned index SHARES these persisted
      * shards ([[sharesShardsWith]]; same [[release]] aliasing as
      * [[remove]]).
      */
    def compact(): HnswRoutedIndex = removed match {
      case None => this
      case Some(pred) =>
        val spark = shards.sparkSession
        import spark.implicits._
        val removedIds = ivfPrep(corpus.where(pred), idCol, vecCol)
          .map { case (id, _, _, _) => id }
          .toDF("rid")
        // which shards hold tombstones, and how many per cell — one
        // distributed pass, collected rows bounded by the shard count
        val hitRows = shards
          .flatMap(fs => fs.ids.iterator.map(id => (fs.key, fs.cell, id)))
          .toDF("key", "cell", "id")
          .join(removedIds, col("id") === col("rid"))
          .groupBy("key", "cell").count()
          .collect()
        val nextCorpus = corpus.where(not(pred))
        if (hitRows.isEmpty)
          return new HnswRoutedIndex(nextCorpus, idCol, vecCol, quantizer, m,
            ef, maxShardRows, numShards, shards, None)
        val hitKeys: Set[Long] = hitRows.map(_.getLong(0)).toSet
        val removedPerCell: Map[Int, Long] = hitRows
          .groupBy(_.getInt(1)).map { case (c, rs) =>
            c -> rs.map(_.getLong(2)).sum
          }
        val oldCellCounts: Map[Int, Long] = shards
          .map(fs => (fs.cell, fs.ids.length.toLong))
          .groupByKey(_._1).mapGroups((c, it) => (c, it.map(_._2).sum))
          .collect().toMap
        val nextSub: Map[Int, Int] = oldCellCounts.map { case (c, n) =>
          c -> routedSubFactorOf(n - removedPerCell.getOrElse(c, 0L),
            maxShardRows)
        }
        val resharded: Set[Int] = removedPerCell.keySet.filter { c =>
          nextSub(c) != routedSubFactorOf(oldCellCounts(c), maxShardRows)
        }
        val reshardedB = spark.sparkContext.broadcast(resharded)
        val hitKeysB = spark.sparkContext.broadcast(hitKeys)
        val survivors = shards
          .filter(fs => reshardedB.value.contains(fs.cell) ||
            hitKeysB.value.contains(fs.key))
          .flatMap(fs => fs.ids.iterator.zip(fs.vecs.iterator)
            .map { case (id, vn) => (fs.cell, id, vn) })
          .toDF("cell", "id", "vn")
          .join(removedIds, col("id") === col("rid"), "left_anti")
          .select("cell", "id", "vn")
          .as[(Int, Long, Array[Double])]
        val rebuilt = buildFrozenShards(survivors, nextSub, m, ef,
          maxShardRows, "HnswRoutedIndex.compact")
        val kept = shards.filter(fs => !reshardedB.value.contains(fs.cell) &&
          !hitKeysB.value.contains(fs.key))
        val next = kept.union(rebuilt)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = next.count()
        new HnswRoutedIndex(nextCorpus, idCol, vecCol, quantizer, m, ef,
          maxShardRows, n, next, None)
    }

    /** (shard key → ids hash) of the standing graphs — the white-box
      * seam the maintenance spec pins the minimal-rebuild contract on:
      * untouched keys must keep identical payloads across insert/compact.
      * Bounded collect (one small row per shard).
      */
    private[graft] def shardFingerprints: Map[Long, Int] = {
      val spark = shards.sparkSession
      import spark.implicits._
      shards.map(fs => (fs.key, java.util.Arrays.hashCode(fs.ids)))
        .collect().toMap
    }

    /** Releases the persisted shard graphs — the lifecycle hook. The
      * index is unusable afterwards only in the sense that the next
      * [[topK]] recomputes the shard lineage; callers done with the
      * corpus should drop the reference too.
      *
      * ALIASING (r18 ADVICE): [[remove]] (always) and a compact whose
      * tombstones match no standing row return an index sharing THIS
      * index's persisted shards — releasing either releases both. Check
      * [[sharesShardsWith]] before releasing a superseded generation
      * (the streaming maintenance loop does).
      */
    def release(): Unit = { shards.unpersist(blocking = true); () }

    /** Durable persistence (r18 verdict ask #1 — the piece that made the
      * standing index session-lifetime only): writes the frozen shard
      * graphs, the quantizer + config, and (by default) a corpus snapshot
      * as Parquet under `path`, so a later job — a DIFFERENT SparkSession,
      * a restart — pays a parquet scan instead of the full rebuild
      * (measured at the 2M×64 bracket in the bench's sf100 fragment:
      * load is a read of ~the corpus bytes; rebuild is minutes of graph
      * insert). [[loadHnswRoutedIndex]] restores an index whose shard
      * fingerprints and served rows are BIT-IDENTICAL to this one (the
      * same contract the maintenance gates pin) — frozen shards are plain
      * product rows, so the round-trip is exact, including the quantizer
      * (flat or two-level) that [[insert]] keeps assigning through.
      *
      * `includeCorpus = false` skips the corpus snapshot for corpora that
      * already live in a durable table (at 100 TB the snapshot IS the
      * dataset — don't copy it); load then takes the corpus as an
      * argument ([[loadHnswRoutedIndexWithCorpus]]) and the caller owns
      * serving EXACTLY the saved rows (the graphs hold the saved ids).
      *
      * Pending [[remove]] tombstones must be [[compact]]ed (or never
      * made) before saving: a tombstone is a session `Column` expression
      * with no durable form — fail-fast, not silent drop.
      */
    def save(path: String, includeCorpus: Boolean = true): Unit = {
      require(removed.isEmpty,
        "HnswRoutedIndex.save: pending remove() tombstones are session " +
          "Column expressions and cannot be serialized — compact() first")
      val spark = shards.sparkSession
      import spark.implicits._
      // ONE ROW PER GRAPH NODE, not per shard (r19, measured): a
      // FrozenShard row at the shipped maxShardRows=16384 is ~10 MB of
      // array cells, and Parquet's vectorized reader could not reserve
      // batch memory for 4096 such rows at the 2M bracket
      // (HnswIndexDurabilityProbe: FAILED_READ_FILE / "cannot reserve
      // additional contiguous bytes" on every load task). Node rows are
      // ~1 KB — bounded, splittable, columnar-friendly at any corpus
      // size — and the CSR reassembly at load is the same deterministic
      // derivation as freeze(), so bit-identity is preserved.
      shards.flatMap { fs =>
        val n = fs.ids.length
        Iterator.tabulate(n) { i =>
          val adj = Array.tabulate(fs.levels(i) + 1) { l =>
            val base = fs.levelBase(i) + l
            java.util.Arrays.copyOfRange(
              fs.adjFlat, fs.adjOff(base), fs.adjOff(base + 1))
          }
          HnswShardNodeRow(fs.key, fs.cell, fs.entry, n, i,
            fs.ids(i), fs.levels(i), fs.vecs(i), adj)
        }
      }.write.mode("overwrite").parquet(path + "/shards")
      if (includeCorpus)
        corpus.write.mode("overwrite").parquet(path + "/corpus")
      val meta = quantizer match {
        case FlatQuantizer(c) =>
          HnswIndexMeta(idCol, vecCol, m, ef, maxShardRows,
            "flat", c, Array.empty, 0)
        case TwoLevelQuantizer(l1, l2, nps) =>
          HnswIndexMeta(idCol, vecCol, m, ef, maxShardRows,
            "two_level", l1, l2, nps)
      }
      Seq(meta).toDS().repartition(1)
        .write.mode("overwrite").parquet(path + "/meta")
    }
  }

  /** The durable form of a [[HnswRoutedIndex]]'s identity — everything
    * except the graphs (stored as [[FrozenShard]] rows) and the corpus
    * (snapshot or caller-owned table): column bindings, graph config, and
    * the quantizer, flattened to one Parquet row. `cents` holds the flat
    * matrix (or the two-level L1); `l2`/`nProbeSuper` are empty/0 for
    * flat.
    */
  private[ann] final case class HnswIndexMeta(
      idCol: String,
      vecCol: String,
      m: Int,
      ef: Int,
      maxShardRows: Int,
      quantizerKind: String,
      cents: Array[Array[Double]],
      l2: Array[Array[Array[Double]]],
      nProbeSuper: Int)

  /** One graph node of a saved shard — the durable layout of
    * [[HnswRoutedIndex.save]] (bounded ~1 KB rows; see the save scaladoc
    * for the measured vectorized-reader failure that rules out
    * shard-per-row). `idx` is the node's position in the shard's array
    * order (adjacency entries reference these indices); `entry`/`n` are
    * shard-level and repeated per node (they compress to nothing in
    * Parquet and spare a second table + join on load).
    */
  private[ann] final case class HnswShardNodeRow(
      key: Long,
      cell: Int,
      entry: Int,
      n: Int,
      idx: Int,
      id: Long,
      level: Int,
      vec: Array[Double],
      adj: Array[Array[Int]])

  /** Restores a [[HnswRoutedIndex.save]]d index from `path`, corpus
    * snapshot included — the restart path of the standing-index story:
    * shard graphs come back as a parquet scan (persisted MEMORY_AND_DISK
    * and eagerly materialized, like a fresh build — but at read cost, not
    * rebuild cost), and the restored index is bit-identical to the saved
    * one: same shard fingerprints, same served rows, same quantizer for
    * every later [[HnswRoutedIndex.insert]]/[[HnswRoutedIndex.compact]].
    */
  def loadHnswRoutedIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): HnswRoutedIndex =
    loadHnswRoutedIndexWithCorpus(spark, path,
      spark.read.parquet(path + "/corpus"))

  /** [[loadHnswRoutedIndex]] with a caller-supplied corpus — the
    * `includeCorpus = false` twin for corpora living in durable tables.
    * The corpus must serve EXACTLY the saved rows (same ids, same
    * vectors): the graphs route and answer with the ids they were built
    * over, and the exact re-rank joins candidates back to THIS frame.
    */
  def loadHnswRoutedIndexWithCorpus(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      corpus: DataFrame): HnswRoutedIndex = {
    import spark.implicits._
    val meta = spark.read.parquet(path + "/meta").as[HnswIndexMeta].head()
    val quantizer: CoarseQuantizer = meta.quantizerKind match {
      case "flat" => FlatQuantizer(meta.cents)
      case "two_level" => TwoLevelQuantizer(meta.cents, meta.l2, meta.nProbeSuper)
      case other => throw new IllegalArgumentException(
        s"loadHnswRoutedIndex: unknown quantizer kind '$other' at $path")
    }
    // reassemble each shard from its node rows: group on the shard key
    // (per-group memory is the same ≤8×maxShardRows bound as the build),
    // order by node index, and re-derive the CSR arrays exactly as
    // freeze() does — deterministic, so fingerprints and search walks
    // are bit-identical to the saved index
    val shards = spark.read.parquet(path + "/shards").as[HnswShardNodeRow]
      .groupByKey(_.key)
      .mapGroups { (key, it) =>
        val nodes = it.toArray.sortBy(_.idx)
        val n = nodes.length
        require(n == nodes.head.n && nodes.last.idx == n - 1,
          s"loadHnswRoutedIndex: shard $key is corrupt — expected " +
            s"${nodes.head.n} nodes, found $n (max idx ${nodes.last.idx})")
        val levels = nodes.map(_.level)
        val levelBase = new Array[Int](n)
        var tot = 0
        var i = 0
        while (i < n) { levelBase(i) = tot; tot += levels(i) + 1; i += 1 }
        val adjOff = new Array[Int](tot + 1)
        var slot = 0; var acc = 0
        i = 0
        while (i < n) {
          var l = 0
          while (l <= levels(i)) {
            adjOff(slot) = acc; acc += nodes(i).adj(l).length
            slot += 1; l += 1
          }
          i += 1
        }
        adjOff(tot) = acc
        val adjFlat = new Array[Int](acc)
        var p = 0
        i = 0
        while (i < n) {
          var l = 0
          while (l <= levels(i)) {
            val ns = nodes(i).adj(l)
            System.arraycopy(ns, 0, adjFlat, p, ns.length); p += ns.length
            l += 1
          }
          i += 1
        }
        FrozenShard(key, nodes.head.cell, nodes.head.entry,
          nodes.map(_.id), levels, nodes.map(_.vec), levelBase, adjOff,
          adjFlat)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = shards.count() // materialize: a restored index is ready NOW
    new HnswRoutedIndex(corpus, meta.idCol, meta.vecCol, quantizer,
      meta.m, meta.ef, meta.maxShardRows, n, shards, None)
  }

  /** Builds a [[HnswRoutedIndex]]: same trainer / assignment /
    * sub-sharding / graph arithmetic as [[hnswRoutedTopK]] (the equality
    * contract), but over EVERY cell — a standing index is query-
    * independent — with the frozen graphs persisted and eagerly
    * materialized so build cost is paid here, not inside the first query
    * batch. Build memory per task is the same `maxShardRows`-target bound
    * as the transient path (8× loud fail on hash-spread degeneration).
    */
  def buildHnswRoutedIndex(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int = 64,
      m: Int = 16,
      ef: Int = 128,
      maxShardRows: Int = 16384,
      lloydIters: Int = 2,
      trainCap: Int = 4096): HnswRoutedIndex = {
    require(numCells > 0,
      "buildHnswRoutedIndex: numCells must be positive")
    val cents = trainIvfCentroids(
      embeddings, idCol, vecCol, numCells, lloydIters, trainCap)
    buildHnswRoutedIndexWithCentroids(embeddings, idCol, vecCol, cents,
      m, ef, maxShardRows)
  }

  /** [[buildHnswRoutedIndex]] with caller-supplied routing centroids —
    * the seam the maintenance contract is stated through: an index built
    * over a corpus prefix and [[HnswRoutedIndex.insert]]ed to the full
    * corpus equals THIS over the full corpus with the same centroids
    * (the standing quantizer is part of the index's identity, so the
    * equality is exact, not approximate — see the insert scaladoc).
    * Also the gate seam: `ann_hnsw_index_inc` pins the oracle dump's own
    * trained centroids here so the incremental path hash-checks against
    * the same routed DuckDB oracle as the fresh build.
    */
  def buildHnswRoutedIndexWithCentroids(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Double]],
      m: Int = 16,
      ef: Int = 128,
      maxShardRows: Int = 16384): HnswRoutedIndex = {
    require(cents.nonEmpty,
      "buildHnswRoutedIndexWithCentroids: cents must be non-empty")
    buildHnswRoutedIndexWithQuantizer(embeddings, idCol, vecCol,
      FlatQuantizer(cents), m, ef, maxShardRows)
  }

  /** A standing index under a [[TwoLevelQuantizer]] (r18 verdict ask #3 —
    * the `CoarseQuantizer` seam wired into the standing index): a standing
    * index is exactly where >4k cells are first wanted — one fixed build,
    * many query batches, finest-cells-affordable — and past ~4k cells the
    * flat quantizer's assignment pass is the measured cliff (841 s at
    * 10240 cells over 2M×64; two-level: 13.8 s). Everything downstream of
    * assignment/routing is the unchanged gated machinery (dense packed
    * cell ids), so [[HnswRoutedIndex.insert]]/[[HnswRoutedIndex.remove]]/
    * [[HnswRoutedIndex.compact]]/[[HnswRoutedIndex.save]] work unchanged
    * — insert assigns new rows THROUGH the standing two-level quantizer
    * (the quantizer is part of the index's identity on every path).
    * `numSuper=1` degenerates bit-identically to
    * [[buildHnswRoutedIndexWithCentroids]] over the same trained children
    * (the [[TwoLevelQuantizer]] degeneracy, spec-pinned on the standing
    * lifecycle too).
    *
    * Train the quantizer with [[trainIvfCentroidsTwoLevel]], and scale its
    * `trainCap` with the target cell count (≥8 sample rows per CHILD as a
    * floor — the default 4096 suits ≤512 total cells; at a 128×80 target
    * pass ~80k): an under-sampled trainer leaves most children as
    * duplicate/zero centroids and the effective cell count collapses far
    * below the flat-equivalent.
    */
  def buildHnswRoutedIndexTwoLevel(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      quantizer: TwoLevelQuantizer,
      m: Int = 16,
      ef: Int = 128,
      maxShardRows: Int = 16384): HnswRoutedIndex =
    buildHnswRoutedIndexWithQuantizer(embeddings, idCol, vecCol, quantizer,
      m, ef, maxShardRows)

  private def buildHnswRoutedIndexWithQuantizer(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      quantizer: CoarseQuantizer,
      m: Int = 16,
      ef: Int = 128,
      maxShardRows: Int = 16384): HnswRoutedIndex = {
    require(maxShardRows > 0,
      "buildHnswRoutedIndex: maxShardRows must be positive")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centsB = spark.sparkContext.broadcast(quantizer)
    // r19 (guide §5 persist-when-reused): the assigned frame feeds TWO
    // sequential consumers — the per-cell counts (sub-shard factors) and
    // the shard build — and each consumption re-ran scan + normalize +
    // quantizer assignment (at the 2M×5120-cell bracket the assignment
    // alone is ~9-14 s/pass). One bounded persist pays the pass once;
    // unpersisted as soon as the shards materialize.
    val assigned = ivfPrep(embeddings, idCol, vecCol)
      .map { case (id, _, _, vn) => (centsB.value.assign(vn), id, vn) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cellCounts: Map[Int, Long] = assigned
        .groupByKey { case (cell, _, _) => cell }.count().collect().toMap
      val subFactors: Map[Int, Int] = cellCounts.map { case (c, n) =>
        c -> routedSubFactorOf(n, maxShardRows)
      }
      val shards = buildFrozenShards(assigned, subFactors, m, ef,
        maxShardRows, "buildHnswRoutedIndex")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = shards.count() // materialize: a standing index builds NOW
      new HnswRoutedIndex(embeddings, idCol, vecCol, quantizer, m, ef,
        maxShardRows, n, shards, None)
    } finally assigned.unpersist()
  }

  /** (cell, id, normalized vector) → one frozen graph per routed shard
    * key — the ONE shard-materialization used by the standing build and
    * by [[HnswRoutedIndex.insert]]/[[HnswRoutedIndex.compact]]'s partial
    * rebuilds (same grouping key, same 8× spread guard, same
    * deterministic build — which is what makes partial rebuild
    * bit-identical to a fresh build over the same rows). `subFactors`
    * must cover every cell present in `assigned`.
    */
  private def buildFrozenShards(
      assigned: org.apache.spark.sql.Dataset[(Int, Long, Array[Double])],
      subFactors: Map[Int, Int],
      m: Int,
      ef: Int,
      maxShardRows: Int,
      context: String): org.apache.spark.sql.Dataset[FrozenShard] = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val subFactorsB = spark.sparkContext.broadcast(subFactors)
    val mm = m; val eff = ef; val cap = maxShardRows
    assigned
      .groupByKey { case (cell, id, _) =>
        routedShardKey(cell, routedSubOf(id, subFactorsB.value(cell)))
      }
      .mapGroups { (key, it) =>
        val cell = (key >>> 20).toInt
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
        it.foreach { case (_, id, vn) =>
          buf += ((id, vn))
          require(buf.length <= 8L * cap,
            s"$context: sub-shard for cell $cell exceeds 8x " +
              s"maxShardRows=$cap — the hash spread degenerated " +
              "(adversarial ids?); raise maxShardRows or investigate the " +
              "id space")
        }
        buildShardGraph(buf.toArray, mm, eff).freeze(key, cell)
      }
  }

  /** LSH-bucketed approximate top-k with OR-amplification: `tables`
    * independent hash tables of `numPlanes` bits each; a corpus vector is a
    * candidate if it collides with the query in ANY table (the classic
    * (b,L) scheme — P[candidate] = 1−(1−p^b)^L). Candidates are scored
    * exactly and ranked; recall vs [[cosineTopK]] is asserted in tests.
    *
    * Scale shape: corpus explodes ×L into (table, bucket) cells — an
    * equi-join on the cell key replaces the all-pairs cross join; bucket
    * fan-in is tunable via `numPlanes` (more bits → smaller buckets).
    *
    * SHIPPED DEFAULT (r15, AnnPresetTuneProbe): `numPlanes=4, tables=16`
    * — measured recall@5 0.63/0.73 at sf0.01/sf0.1 on the near-random
    * gate corpus (the documented LSH worst case), touching ~7.6% of
    * all pairs at sf0.1; the pedagogical 8×8 gate config measures
    * 0.15/0.13. Wider buckets ARE the recall lever for plain LSH — on a
    * clustered production corpus raise `numPlanes` back toward 6-8 to
    * shrink cells, or prefer [[lshMultiProbeTopK]], which buys its
    * recall on the query side at the same index cost. Tripwired in
    * AnnRecallSpec; both configs recorded in RECALL.json.
    *
    * ROLE (r18, measured at the 10× bracket — the family's ceiling in
    * numbers): the shipped 4×16 reads 0.820; every single-probe route to
    * ≥0.9 pays in exactly the currency that matters at 100 TB — 4×32
    * reaches 0.900 by DOUBLING the corpus index cells, 3×16 reaches
    * 0.900 by coarsening buckets into a 3.7× wall (rerank fan-in), and
    * 5×16 drops to 0.652. [[lshMultiProbeTopK]] reads 0.968 on the SAME
    * 16-table index via query-side probes. Single-probe LSH is therefore
    * the pedagogical baseline tier of this family: keep it for its
    * one-bucket-per-table index simplicity and as the differential twin;
    * prefer multi-probe whenever recall matters. Ceiling rows recorded in
    * RECALL_SF10DUP.json.
    */
  def lshTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      dim: Int,
      numPlanes: Int = 4,
      tables: Int = 16): DataFrame = {
    val sigs = array((0 until tables).map { t =>
      struct(lit(t).as("t"),
        hyperplaneSignature(col(vecCol), dim, numPlanes, t * numPlanes).as("sig"))
    }: _*)
    // Candidate generation and the (query, neighbor) dedup carry IDS ONLY —
    // the OR-amplification dedup exchange moves (cell, id) longs, never the
    // 64-dim vectors (a vector-laden Exchange is the 100 TB cost). Vectors
    // and their ONCE-precomputed norms join back in afterwards, so scoring
    // is a single dot product per surviving pair instead of three.
    val candidates = embeddings.where(queryPred)
      .select(col(idCol).as("query_id"), explode(sigs).as("cell"))
      .join(
        embeddings.select(col(idCol).as("neighbor_id"), explode(sigs).as("cell")),
        Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    exactRerank(candidates, embeddings, idCol, vecCol, k)
  }

  /** Multi-probe LSH top-k (Lv et al., VLDB'07): each query probes its own
    * bucket PLUS every bucket within Hamming distance `probeBits` per
    * table — a candidate is any corpus vector whose per-table signature
    * differs from the query's in at most `probeBits` bits. Equivalent
    * recall to running many more tables, at the cost of fanning out the
    * QUERY side only: the corpus index stays exactly [[lshTopK]]'s
    * `tables` cells per vector (the 100 TB asymmetry — corpus cells
    * dominate storage and shuffle, queries are the small side), while
    * each query emits `(1+numPlanes[+C(numPlanes,2)])×tables` probe
    * cells. Candidates strictly contain [[lshTopK]]'s (the flip set
    * includes the identity probe) and grow monotonically with
    * `probeBits`, so recall can only go up — measured per round in
    * RECALL.json; output pinned by a full hash oracle whose candidate
    * rule is `bit_count(xor(sig_q, sig_n)) <= probeBits` per table over
    * the same literal-embedded plane matrix.
    *
    * SHIPPED DEFAULT (r17, RecallFrontierProbe at the 10× bracket):
    * `numPlanes=6, tables=16, probeBits=2` — recall@5 ≥0.9 on 200k×64
    * i.i.d.-Gaussian vectors with the CORPUS INDEX UNCHANGED from the
    * r15 6×16 preset (which reads 0.868 at 10× with 1-bit probes; its
    * sf0.01/sf0.1 rows were 0.69/0.84). The 2-bit flip set triples the
    * query-side fan-out (22 probes/table vs 7) — the scale-correct
    * lever, since the alternative ≥0.9 configs grow the corpus index:
    * 6×32 1-bit → 0.924 and 5×32 → 0.964 but at 2× the corpus cells.
    * The pedagogical 8×8×1-bit gate config is pinned explicitly
    * (AnnGateConfigSpec). Tripwired in AnnRecallSpec; 10× rows in
    * RECALL.json's sf10dup section.
    */
  def lshMultiProbeTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      dim: Int,
      numPlanes: Int = 6,
      tables: Int = 16,
      probeBits: Int = 2): DataFrame = {
    require(probeBits == 1 || probeBits == 2,
      s"probeBits must be 1 or 2, got $probeBits — the flip-set size is " +
        "C(numPlanes,<=probeBits); past 2 bits you are probing most of the " +
        "table and should lower numPlanes or use ivfTopK instead")
    val sigs = array((0 until tables).map { t =>
      struct(lit(t).as("t"),
        hyperplaneSignature(col(vecCol), dim, numPlanes, t * numPlanes).as("sig"))
    }: _*)
    val corpusCells = embeddings
      .select(col(idCol).as("neighbor_id"), explode(sigs).as("cell"))
      .select(col("neighbor_id"), col("cell.t").as("t"), col("cell.sig").as("sig"))
    // query probes: the signature itself plus each of its <=probeBits-bit
    // flips — computed AFTER the per-table explode so the signature
    // expression runs once per (query, table), not once per probe
    val flipMasks: Seq[Long] = {
      val one = (0 until numPlanes).map(p => 1L << p)
      val two =
        if (probeBits < 2) Seq.empty
        else for {
          i <- 0 until numPlanes; j <- (i + 1) until numPlanes
        } yield (1L << i) | (1L << j)
      0L +: (one ++ two)
    }
    val queryCells = embeddings.where(queryPred)
      .select(col(idCol).as("query_id"), explode(sigs).as("cell"))
      .select(col("query_id"), col("cell.t").as("t"), explode(array(
        flipMasks.map(mk =>
          if (mk == 0L) col("cell.sig") else col("cell.sig").bitwiseXOR(lit(mk))): _*))
        .as("sig"))
    val candidates = queryCells
      .join(corpusCells, Seq("t", "sig"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    exactRerank(candidates, embeddings, idCol, vecCol, k)
  }
}
