package graft.bio

/** DNA sequence primitives shared by every kernel and pipeline.
  *
  * Semantics derived from the reference implementation (cited per member);
  * re-expressed from scratch for Spark-side use (pure, allocation-light,
  * callable from UDFs and `mapPartitions` alike).
  */
object Dna {

  /** Wobble-aware base comparison: bases match if equal, or if the query base
    * is 'c' and the subject base is 't' (one-directional C≈T wobble).
    * Reference: `src/analysis/similarities/base_similarity.py:12-18`
    * (`should_change` returns 0 on match — we return the Boolean directly).
    */
  @inline def baseMatches(a: Char, b: Char): Boolean =
    a == b || (a == 'c' && b == 't')

  /** Mismatch cost used by the edit-distance DP: 0 on (wobble) match, 1 else.
    * Exact counterpart of `should_change`.
    */
  @inline def changeCost(a: Char, b: Char): Int = if (baseMatches(a, b)) 0 else 1

  /** Reverse complement with the reference's exact quirk: characters outside
    * {a,c,g,t} are silently DROPPED (not preserved, not errored).
    * Reference: `src/utils/gene_util.py:1-8` (`get_opposite_dna` applied to the
    * already-reversed string, `src/analysis/gene_similarity_match.py:66`).
    */
  def reverseComplement(dna: String): String = {
    val sb = new java.lang.StringBuilder(dna.length)
    var i = dna.length - 1
    while (i >= 0) {
      dna.charAt(i) match {
        case 'a' => sb.append('t')
        case 't' => sb.append('a')
        case 'c' => sb.append('g')
        case 'g' => sb.append('c')
        case _   => () // reference drops unknown characters
      }
      i -= 1
    }
    sb.toString
  }

  /** Complement WITHOUT reversal, unknown characters dropped — the exact
    * behavior of `get_opposite_dna` applied to a NON-reversed string, as
    * the range→gene probe does for '−' ranges (reference
    * `src/utils/gene_position_helper.py:47-49` — a quirk: every other
    * call site reverses first; this one does not, and downstream
    * consumers of `near_gene` outputs depend on it).
    */
  def complement(dna: String): String = {
    val sb = new java.lang.StringBuilder(dna.length)
    var i = 0
    while (i < dna.length) {
      dna.charAt(i) match {
        case 'a' => sb.append('t')
        case 't' => sb.append('a')
        case 'c' => sb.append('g')
        case 'g' => sb.append('c')
        case _   => ()
      }
      i += 1
    }
    sb.toString
  }

  /** Strict complement map for contexts that must not drop characters
    * (our engine's recommended default; the parity path uses
    * [[reverseComplement]]).
    */
  def reverseComplementStrict(dna: String): String = {
    val sb = new java.lang.StringBuilder(dna.length)
    var i = dna.length - 1
    while (i >= 0) {
      sb.append(dna.charAt(i) match {
        case 'a' => 't'; case 't' => 'a'; case 'c' => 'g'; case 'g' => 'c'
        case 'A' => 'T'; case 'T' => 'A'; case 'C' => 'G'; case 'G' => 'C'
        case c   => c
      })
      i -= 1
    }
    sb.toString
  }

  /** Coordinate algebra for match candidates — THE invariant the whole
    * downstream pipeline depends on (reference
    * `src/analysis/models/match_candidate.py:16-22`):
    *
    *   - forward strand: 1-based inclusive `start = left+1`, `end = right+1`
    *   - reverse strand: scan coordinates are on the reverse-complement
    *     string; genome coordinates are `start = N - left`, `end = N - right`
    *     so `start > end` ENCODES the minus strand for every downstream
    *     parser (`gene_location_analysis.py:262`, `neighbor_analysis.py:69`).
    */
  def candidateStart(left: Int, isReverse: Boolean, dbLength: Int): Int =
    if (isReverse) dbLength - left else left + 1

  def candidateEnd(right: Int, isReverse: Boolean, dbLength: Int): Int =
    if (isReverse) dbLength - right else right + 1
}
