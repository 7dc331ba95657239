package graft.bio

/** From-first-principles reformulation of the blat seed-extend kernel, for
  * the [[NaiveBlatSpec]] differential — the [[graft.ann.NaiveAnn]] pattern
  * applied to the `x5_blat_text` pin. The production kernel
  * ([[SimilarityKernels.blatSimilarity]]) is a recursive DFS with mutable
  * shared state transliterated from the reference's quirk-for-quirk
  * semantics; this reimplementation derives the same FUNCTION
  * declaratively:
  *
  *   - the two greedy halves become one shared skip-scanner that returns
  *     the matched db POSITIONS (db end mid-skip or a blown insert budget
  *     fail; db end right after a match truncates successfully);
  *   - the `matchedLen`/`cond` acceptance quirk becomes a closed-form
  *     predicate on those positions: the segment's first char matched at
  *     the segment start with no preceding skip, OR two gene chars
  *     matched at ADJACENT db positions;
  *   - the DFS backtracking over the gene[4] anchor becomes explicit
  *     candidate enumeration with a POSITIONAL insert budget: every db
  *     char before the current candidate — skipped or failed — costs one
  *     insert, so a candidate at position p is admissible iff
  *     p − start ≤ midLimit, no recursion needed.
  *
  * A control-flow bug on either side (skip/fail ordering, the one-char
  * gap after the first half, truncation acceptance, budget off-by-ones)
  * diverges the outputs; only the agreed spec survives.
  */
object NaiveBlat {

  /** Greedy skip-scan of gene[from until) starting at db position `start`
    * with `budget` inserts: returns (matched positions, final cursor), or
    * None when the budget blows or the db ends mid-skip. Truncation by db
    * end after a match is a SUCCESSFUL (shorter) scan.
    */
  private def scan(gene: String, db: String, from: Int, until: Int,
      start: Int, budget: Int): Option[(Vector[Int], Int)] = {
    var pg = from
    var pd = start
    var ins = 0
    val ps = Vector.newBuilder[Int]
    while (pg < until && pd < db.length) {
      if (Dna.baseMatches(gene.charAt(pg), db.charAt(pd))) {
        ps += pd; pg += 1; pd += 1
      } else {
        ins += 1; pd += 1
        if (ins > budget || pd >= db.length) return None
      }
    }
    Some((ps.result(), pd))
  }

  /** The acceptance quirk, closed form: at least one match landed with
    * "momentum" — the segment's first char at its start position, or any
    * two matches on adjacent db positions.
    */
  private def momentum(ps: Vector[Int], start: Int): Boolean =
    ps.nonEmpty && (ps.head == start ||
      (0 until ps.length - 1).exists(i => ps(i + 1) == ps(i) + 1))

  def blatSimilarity(gene: String, db: String, offset: Int,
      midLimit: Int = 10, endLimit: Int = 2): (Boolean, Option[Int]) = {
    require(gene.length == 8)
    if (!Dna.baseMatches(gene.charAt(0), db.charAt(offset))) return (false, None)

    scan(gene, db, 1, 4, offset + 1, midLimit) match {
      case None => (false, None)
      case Some((ps, _)) if !momentum(ps, offset + 1) => (false, None)
      case Some((_, pd)) =>
        // the production DFS hands phase B `posData + 1` — one db char
        // after the first half's cursor is unconditionally skipped
        val bStart = pd + 1
        var cand = bStart
        while (cand < db.length && cand - bStart <= midLimit) {
          if (Dna.baseMatches(gene.charAt(4), db.charAt(cand))) {
            scan(gene, db, 5, 8, cand + 1, endLimit) match {
              case Some((ps2, pd2)) if momentum(ps2, cand + 1) =>
                return (true, Some(pd2))
              case _ => () // failed anchor = one more positional insert
            }
          }
          cand += 1
        }
        (false, None)
    }
  }

  /** The sweep aggregate the gate computes, over the naive kernel. */
  def blatSweep(gene: String, dna: String,
      midLimit: Int = 10, endLimit: Int = 2): (Long, Int) = {
    var hits = 0L
    var firstEnd = -1
    var o = 0
    val last = dna.length - gene.length - midLimit - endLimit - 2
    while (o <= last) {
      val (ok, endOpt) = blatSimilarity(gene, dna, o, midLimit, endLimit)
      if (ok) {
        hits += 1
        if (firstEnd < 0) firstEnd = endOpt.getOrElse(-1)
      }
      o += 1
    }
    (hits, firstEnd)
  }
}
