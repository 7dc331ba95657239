package graft.bio

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** X4 pattern kernel differential: 100 cases (random RNA + random
  * must/optional condition windows × exact/random/mutated subject windows)
  * whose scores were produced by EXECUTING the reference `MatchPattern` +
  * `PatternSimilarity`. Covers the quirky geometry too — overlapping must
  * windows concatenate in the compiled regex and can reject even the
  * exact sequence.
  */
class PatternDifferentialSpec extends AnyFunSuite {

  private def conds(s: String): Seq[PatternCondition] =
    if (s.isEmpty) Nil
    else s.split(";").toSeq.map { c =>
      val Array(o, l) = c.split(",")
      PatternCondition(o.toInt, l.toInt)
    }

  test("pattern kernel matches executed reference on 100 cases") {
    val lines = Source.fromResource("pattern_goldens.tsv").getLines().drop(1).toVector
    assert(lines.size === 100)
    for (line <- lines) {
      val parts = line.split("\t", -1)
      val (rna, window, must, optional, want) =
        (parts(0), parts(1), parts(2), parts(3), parts(4).toInt)
      val p = MatchPattern(rna, conds(must), conds(optional))
      assert(p.score(window) === want, s"pattern($rna, $window, must=$must, opt=$optional)")
    }
  }
}
