package graft.relational

import graft.bio.SimilarityKernels
import org.scalatest.funsuite.AnyFunSuite

/** The committed adversarial differential the r15 ADVICE asked for: the
  * x5 blat oracle SQL (`CoverageQueries.x5OracleSql`) re-derives the
  * budget-bounded DFS as scalar phases (greedy chain → anchor fan-out →
  * end chain with truncated-success CASE arms). This spec pins that
  * DERIVATION: a line-by-line Scala transliteration of the SQL's CTE
  * phases (same window, same `rem` bounds, same CASE ladder, same
  * least-of-strpos wobble) differentialed against the real kernel
  * ([[SimilarityKernels.blatSweep]]) over the same adversarial corpus
  * families the SQL was built with (uniform / a-heavy / boundary-length /
  * g-run / t-heavy) plus planted-hit and truncation-edge cases. The SQL
  * TEXT itself is exercised against DuckDB by
  * `tools/x5_blat_differential.py` (committed alongside), which feeds the
  * exact shipped string through `graft.PrintOracle`.
  */
class X5OracleDerivationSpec extends AnyFunSuite {

  private val gene = "gattacca"
  private val mid = 10
  private val endL = 2

  /** 1-based window position of the first class(ch) match at >= start —
    * the SQL's least-of-nullif-strpos (`firstAt` in x5OracleSql). DuckDB
    * `least` skips NULLs; `substr` past the end yields '' -> strpos 0 ->
    * NULL. `indexOf` reproduces both.
    */
  private def firstAt(w: String, start: Int, ch: Char): Option[Int] = {
    val cls = if (ch == 'c') Seq('c', 't') else Seq(ch)
    val found = cls.flatMap { c =>
      val i = w.indexOf(c.toInt, start - 1)
      if (i >= 0) Some(i + 1) else None
    }
    if (found.isEmpty) None else Some(found.min)
  }

  /** The oracle SQL's phases, transliterated CTE by CTE. */
  private def sweepViaSql(dna: String): (Long, Int) = {
    val len = dna.length
    if (len < 22) return (0L, -1)
    var hits = 0L
    var firstEnd = -1
    var o = 0
    while (o <= len - 22) {
      if (dna.charAt(o) == gene.charAt(0)) {
        // offs: the 31-char window and chars remaining from this offset
        val w = dna.substring(o, math.min(o + 31, len))
        val rem = len - o
        // p1: greedy chain q1 < q2 < q3 with the single final skip bound
        val q1 = firstAt(w, 2, gene.charAt(1))
        val q2 = q1.flatMap(q => firstAt(w, q + 1, gene.charAt(2)))
        val q3 = q2.flatMap(q => firstAt(w, q + 1, gene.charAt(3)))
        val p1ok = (q1, q2, q3) match {
          case (Some(v1), Some(v2), Some(v3)) =>
            val cond1 = v1 == 2 || v2 == v1 + 1 || v3 == v2 + 1
            v3 - 4 <= mid && cond1 && v3 + 1 <= rem && v3 + 2 <= rem
          case _ => false
        }
        if (p1ok) {
          val s = q3.get + 2
          // anchors + p57: first succeeding anchor wins (min over x)
          var bestEnd = -1
          var da = 0
          while (da <= mid && bestEnd < 0) {
            val x = s + da
            if (x <= w.length && x <= rem &&
                (if (gene.charAt(4) == 'c') w.charAt(x - 1) == 'c' || w.charAt(x - 1) == 't'
                 else w.charAt(x - 1) == gene.charAt(4))) {
              val r5 = firstAt(w, x + 1, gene.charAt(5))
              val r6 = r5.flatMap(r => firstAt(w, r + 1, gene.charAt(6)))
              val r7 = r6.flatMap(r => firstAt(w, r + 1, gene.charAt(7)))
              // the CASE ladder, arm for arm (incl. truncated success)
              val hitEnd: Option[Int] =
                if (x + 1 > rem) None
                else if (r5.isEmpty || r5.get - (x + 1) > endL) None
                else if (r5.get + 1 > rem) {
                  if (r5.get == x + 1) Some(o + r5.get) else None
                } else if (r6.isEmpty || r6.get - (x + 1) - 1 > endL) None
                else if (r6.get + 1 > rem) {
                  if (r5.get == x + 1 || r6.get == r5.get + 1) Some(o + r6.get) else None
                } else if (r7.isEmpty || r7.get - (x + 1) - 2 > endL) None
                else if (r5.get == x + 1 || r6.get == r5.get + 1 ||
                         r7.get == r6.get + 1) Some(o + r7.get)
                else None
              hitEnd.foreach(bestEnd = _)
            }
            da += 1
          }
          if (bestEnd >= 0) {
            hits += 1
            if (firstEnd < 0) firstEnd = bestEnd
          }
        }
      }
      o += 1
    }
    (hits, firstEnd)
  }

  private def check(dna: String): Unit = {
    val expected = SimilarityKernels.blatSweep(gene, dna, mid, endL)
    val got = sweepViaSql(dna)
    assert(got == expected,
      s"derivation diverged from kernel on '${dna.take(80)}'" +
        s"${if (dna.length > 80) "..." else ""} (len ${dna.length}): " +
        s"sql=$got kernel=$expected")
  }

  private def randomDna(rnd: scala.util.Random, n: Int,
      weights: Map[Char, Double]): String = {
    val cum = weights.toSeq.scanLeft(('x', 0.0)) {
      case ((_, acc), (c, p)) => (c, acc + p)
    }.tail
    val total = cum.last._2
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) {
      val r = rnd.nextDouble() * total
      sb.append(cum.find(_._2 >= r).get._1)
      i += 1
    }
    sb.toString
  }

  private val uniform = Map('a' -> 0.25, 'c' -> 0.25, 'g' -> 0.25, 't' -> 0.25)

  test("uniform corpus: derivation == kernel (500 docs)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach(_ => check(randomDna(rnd, 30 + rnd.nextInt(120), uniform)))
  }

  test("a-heavy corpus (skip-budget edges)") {
    val rnd = new scala.util.Random(43)
    val w = Map('a' -> 0.7, 'c' -> 0.1, 'g' -> 0.1, 't' -> 0.1)
    (1 to 500).foreach(_ => check(randomDna(rnd, 30 + rnd.nextInt(120), w)))
  }

  test("g-run corpus (anchor-dense, phase-1 starts everywhere)") {
    val rnd = new scala.util.Random(44)
    val w = Map('a' -> 0.15, 'c' -> 0.1, 'g' -> 0.65, 't' -> 0.1)
    (1 to 500).foreach(_ => check(randomDna(rnd, 30 + rnd.nextInt(120), w)))
  }

  test("t-heavy corpus (wobble class saturated)") {
    val rnd = new scala.util.Random(45)
    val w = Map('a' -> 0.1, 'c' -> 0.1, 'g' -> 0.1, 't' -> 0.7)
    (1 to 500).foreach(_ => check(randomDna(rnd, 30 + rnd.nextInt(120), w)))
  }

  test("boundary lengths 20..40 (rem bounds and truncated-success arms)") {
    val rnd = new scala.util.Random(46)
    // short strings put every phase's end-of-string arm in play; sweep
    // each length many times across all four distributions
    for (len <- 20 to 40; w <- Seq(uniform,
        Map('a' -> 0.5, 'c' -> 0.15, 'g' -> 0.2, 't' -> 0.15),
        Map('a' -> 0.2, 'c' -> 0.15, 'g' -> 0.5, 't' -> 0.15));
        _ <- 1 to 40)
      check(randomDna(rnd, len, w))
  }

  test("planted hits: exact gene, spaced variants, tail-truncated") {
    val rnd = new scala.util.Random(47)
    val fillers = Seq("cccccccccccccc", "tttttttttttttt", "gggggggggggggg")
    for (f <- fillers; pre <- 0 to 3) {
      // exact planted hit at varying offsets, padded to >= 22 chars
      check(f.take(pre) + gene + f)
      // spaced phase-1 (skips inside the first half)
      check(f.take(pre) + "gaxttacca".replace('x', f.head) + f)
      // planted hit ending exactly at the string end (truncation arms)
      val tail = f.take(14 - pre)
      check(tail + f.take(pre) + gene)
    }
    // random mutations of a planted hit — flips single bases to walk the
    // CASE ladder's adjacency disjunction through every arm
    (1 to 800).foreach { _ =>
      val base = new StringBuilder("cccccc" + gene + "gattacca" + "cccccc")
      val i = rnd.nextInt(base.length)
      base.setCharAt(i, "acgt".charAt(rnd.nextInt(4)))
      check(base.toString)
    }
  }
}
