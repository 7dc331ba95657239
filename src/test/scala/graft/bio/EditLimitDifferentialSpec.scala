package graft.bio

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** X2 continuous-mismatch-limit differential: 60 executed-reference cases
  * sweeping limits 1..6 — the backtrace's tie order decides which path is
  * walked and therefore whether the limit fires, so this corner needs its
  * own corpus beyond the limit=3 cases in KernelDifferentialSpec.
  */
class EditLimitDifferentialSpec extends AnyFunSuite {

  test("text_edit with limits 1..6 matches the executed reference on 60 cases") {
    val lines = Source.fromResource("editlimit_goldens.tsv").getLines().toVector
    assert(lines.size === 60)
    for (line <- lines) {
      val Array(g, db, off, lim, want) = line.split("\t")
      assert(
        SimilarityKernels.textEditScore(g, db, off.toInt, continuousMismatchLimit = lim.toInt)
          === want.toDouble,
        s"text_edit($g, $db, $off, limit=$lim)")
    }
  }
}
