package graft.bio

/** Compiled regex gate + additive scoring for the pattern kernel (X4).
  *
  * Reference: `src/analysis/models/match_pattern.py:6-48` (pattern compiler)
  * and `src/analysis/similarities/pattern_similarity.py:13-24` (scoring).
  *
  * `must` conditions are windows of the query (`offset`, `length`; negative
  * offsets count from the end) that MUST appear in order in the subject
  * window; each query 'c' degrades to `(c|t)` (the wobble rule in regex
  * form). Score = total length of matched must-windows; each optional
  * condition adds its length when its extended regex (optional ∪ must,
  * re-sorted by offset) also matches.
  *
  * Reference bug fixed, not copied (SURVEY §2.3 X4): `get_similarity`
  * returns a bare int where the blend API unpacks a tuple — our [[score]]
  * is the int and the blend wraps it uniformly.
  */
final case class PatternCondition(offset: Int, length: Int)

final class MatchPattern private (
    val mustPattern: java.util.regex.Pattern,
    val mustScore: Int,
    val optionPatterns: List[(java.util.regex.Pattern, Int)]) extends Serializable {

  /** Score the subject window: 0 unless the must-pattern matches at the
    * window start (`re.match` semantics = lookingAt); then mustScore plus
    * each optional pattern's incremental score.
    */
  def score(window: String): Int = {
    if (!mustPattern.matcher(window).lookingAt()) 0
    else {
      var s = mustScore
      optionPatterns.foreach { case (p, add) =>
        if (p.matcher(window).lookingAt()) s += add
      }
      s
    }
  }
}

object MatchPattern {

  def apply(rna: String, must: Seq[PatternCondition], optional: Seq[PatternCondition]): MatchPattern = {
    val (mustPat, mustScore) = generate(rna, must)
    val options = optional.map { opt =>
      val (p, s) = generate(rna, opt +: must)
      (java.util.regex.Pattern.compile(p), s - mustScore)
    }.toList
    new MatchPattern(
      java.util.regex.Pattern.compile(mustPat), mustScore, options)
  }

  /** Compile ordered condition windows into one anchored regex + score.
    * Conditions sort by normalized offset; gaps between windows become `.+`
    * (one-or-more — adjacent windows with a gap REQUIRE at least one base
    * between them, exactly as the reference's generator emits).
    */
  private def generate(rna: String, conditions: Seq[PatternCondition]): (String, Int) = {
    val rnaLen = rna.length
    val sorted = conditions.sortBy(c => if (c.offset >= 0) c.offset else rnaLen + c.offset)
    val sb = new StringBuilder
    var score = 0
    var index = 0
    sorted.foreach { c =>
      val off = if (c.offset < 0) rnaLen + c.offset else c.offset
      if (off == 0) sb.append('^')
      if (off > index) sb.append(".+")
      sb.append(degenerate(rna.substring(off, off + c.length)))
      index = off + c.length
      if (index == rnaLen) sb.append('$')
      score += c.length
    }
    if (index != rnaLen) sb.append(".+")
    (sb.toString, score)
  }

  /** Lowercase and expand each 'c' to `(c|t)` (wobble degeneracy). */
  private def degenerate(segment: String): String =
    segment.toLowerCase.flatMap {
      case 'c' => "(c|t)"
      case c   => c.toString
    }
}
