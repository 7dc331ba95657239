package graft.bio

import scala.collection.mutable

/** Match candidate + the T1 spatial-suppression operator (SURVEY §2.6 T1) —
  * the reference's one genuinely novel operator.
  *
  * Reference: `src/analysis/models/match_candidate.py:7-26` (candidate,
  * coordinate algebra) and `src/analysis/gene_similarity_match.py:259-277`
  * (`update_candidate_list`, the monotone deque).
  */
final case class MatchCandidate(
    left: Int,
    right: Int,
    isReverse: Boolean,
    databaseLength: Int,
    weightedSimilarity: Double,
    similarityScores: Map[String, Double] = Map.empty) {

  /** 1-based genome coordinates; start > end encodes the minus strand. */
  val start: Int = Dna.candidateStart(left, isReverse, databaseLength)
  val end: Int = Dna.candidateEnd(right, isReverse, databaseLength)
}

object Suppression {

  /** Suppress candidates that have a strictly better neighbor within
    * `candidateDistance` scan positions, preserving the reference's exact
    * (asymmetric) rules, reference `gene_similarity_match.py:259-277`:
    *
    *   - candidates arrive in scan-offset order; a sliding deque holds the
    *     last `candidateDistance` of them;
    *   - a new candidate with score ≤ 0 is marked ignored immediately;
    *   - against each deque member: member strictly greater → new is
    *     ignored; member strictly smaller → member is ignored. Equal scores
    *     coexist (both survive);
    *   - NOTE the ignore marks are NOT exclusive — a candidate can be
    *     suppressed and still suppress later arrivals (the reference loops
    *     over the whole deque unconditionally);
    *   - deque members are emitted (if unsuppressed) once the window passes
    *     them; the final drain uses keep_size=1
    *     (`gene_similarity_match.py:233-234`), flushing everything.
    *
    * `dropNonPositive=false` disables the score≤0 drop: in ascending-order
    * scans the ranking value is negated, so the reference's unconditional
    * drop would suppress every candidate — a bug we fix rather than copy
    * (SURVEY §7.4; the reference's Increment path is vestigial).
    *
    * Pure single-pass form: the Spark operator applies this per partition
    * over offset-sorted candidates (see [[GenomeScan]]), with partition
    * boundaries aligned to scan chunks exactly like the reference's
    * 32-chunk split (each chunk restarts an empty deque —
    * `gene_similarity_match.py:98-104,157-235`).
    */
  def suppress(
      candidates: Iterator[MatchCandidate],
      candidateDistance: Int,
      dropNonPositive: Boolean = true): Iterator[MatchCandidate] = {

    // deque entries: (candidate, ignored flag)
    final class Entry(val c: MatchCandidate) { var ignored: Boolean = false }
    val buff = new java.util.ArrayDeque[Entry]()
    val out = mutable.ArrayBuffer.empty[MatchCandidate]

    def update(newCandidate: Entry, keepSize: Int): Unit = {
      while (buff.size >= keepSize ||
             (!buff.isEmpty && newCandidate != null &&
              math.abs(buff.peekFirst.c.start - newCandidate.c.start) >= keepSize)) {
        val old = buff.pollFirst()
        if (!old.ignored) out += old.c
      }
      if (newCandidate != null) {
        if (dropNonPositive && newCandidate.c.weightedSimilarity <= 0.0) newCandidate.ignored = true
        val it = buff.iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.c.weightedSimilarity > newCandidate.c.weightedSimilarity) newCandidate.ignored = true
          else if (e.c.weightedSimilarity < newCandidate.c.weightedSimilarity) e.ignored = true
        }
        buff.addLast(newCandidate)
      }
    }

    candidates.foreach(c => update(new Entry(c), candidateDistance))
    while (!buff.isEmpty) update(null, 1)
    out.iterator
  }

  /** Bounded top-k by score descending with a deterministic tiebreak
    * (strand then scan position — the reference's stable-sort encounter
    * order, `gene_similarity_match.py:105-107`). Used per-partition then
    * globally, so the result is identical to a full sort + take(k) at a
    * fraction of the memory.
    */
  def topK(candidates: Iterator[MatchCandidate], k: Int): Vector[MatchCandidate] = {
    val rank: MatchCandidate => (Double, Boolean, Int) =
      c => (-c.weightedSimilarity, c.isReverse, c.left)
    // max-heap by rank tuple: the head is the WORST kept candidate, evicted
    // when a better one arrives — classic bounded top-k.
    val heap = mutable.PriorityQueue.empty[MatchCandidate](Ordering.by(rank))
    candidates.foreach { c =>
      heap.enqueue(c)
      if (heap.size > k) heap.dequeue()
    }
    heap.toVector.sortBy(rank)
  }
}
