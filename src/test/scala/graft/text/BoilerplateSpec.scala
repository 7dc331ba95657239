package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[TextOps.stripBoilerplate]]'s rule on planted corpora: source
  * scoping, the max(minDocs, ceil(minFrac·n)) threshold, trailing-chunk
  * immunity, and the token-stream rewrite (including the everything-
  * dropped edge the oracle's COALESCE covers).
  */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def toks(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  /** 8-token header chunk shared verbatim. */
  private val header = "home about contact login search terms privacy cookie"

  private def run(rows: Seq[(Long, String, String)],
      minDocs: Int = 2, minFrac: Double = 0.0): Map[Long, (Int, Int, String)] =
    TextOps.stripBoilerplate(
        rows.toDF("doc_id", "source", "text"), 8, minDocs, minFrac)
      .select(col("doc_id"), col("n_chunks"), col("n_dropped"), col("clean_text"))
      .as[(Long, Int, Int, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

  test("shared header strips in its source; the SAME text in a lone doc of another source survives") {
    val rows = Seq(
      (1L, "a", s"$header ${toks(8, "x")}"),
      (2L, "a", s"$header ${toks(8, "y")}"),
      (3L, "a", toks(16, "z")),
      // source b carries the identical header ONCE — below threshold there
      (4L, "b", s"$header ${toks(8, "w")}"))
    val out = run(rows)
    assert(out(1L) == ((2, 1, toks(8, "x"))))
    assert(out(2L) == ((2, 1, toks(8, "y"))))
    assert(out(3L) == ((2, 0, toks(16, "z"))))
    assert(out(4L) == ((2, 0, s"$header ${toks(8, "w")}")))
  }

  test("minFrac raises the threshold above minDocs") {
    // 10 docs in the source, header in 3 of them: ceil(0.5*10)=5 > 3 — kept
    val rows = (1L to 10L).map { i =>
      val body = toks(8, s"b$i")
      if (i <= 3) (i, "s", s"$header $body") else (i, "s", body)
    }
    val strict = run(rows, minDocs = 2, minFrac = 0.5)
    assert(strict.values.forall(_._2 == 0), "nothing reaches the 50% bar")
    val loose = run(rows, minDocs = 2, minFrac = 0.2)
    assert((1L to 3L).forall(i => loose(i)._2 == 1), "3/10 passes the 20% bar")
  }

  test("trailing partial chunk is never boilerplate; mid-doc chunks drop by position") {
    // 19 tokens: chunks are [0..7], [8..15]; tokens 16..18 are the tail.
    // The SECOND chunk is the shared one — surgery must remove the middle
    // 8 tokens and keep prefix + tail.
    val pre1 = toks(8, "p")
    val pre2 = toks(8, "q")
    val tail = "t0 t1 t2"
    val rows = Seq(
      (1L, "s", s"$pre1 $header $tail"),
      (2L, "s", s"$pre2 $header $tail"))
    val out = run(rows)
    assert(out(1L) == ((2, 1, s"$pre1 $tail")))
    assert(out(2L) == ((2, 1, s"$pre2 $tail")))
    // the 3-token tail is identical across both docs but never a chunk
  }

  test("doc whose every full chunk is boilerplate flattens to the empty string") {
    val rows = Seq(
      (1L, "s", header),
      (2L, "s", header),
      (3L, "s", s"$header ${toks(8, "u")}"))
    val out = run(rows)
    assert(out(1L) == ((1, 1, "")))
    assert(out(2L) == ((1, 1, "")))
    assert(out(3L) == ((2, 1, toks(8, "u"))))
  }

  test("gate query is non-vacuous at sf0.01: the drop path fires") {
    val out = graft.SparkEntry.queries("cur_boilerplate")(spark, sf001)
    val dropped = out.where(col("n_dropped") > 0).count()
    assert(dropped > 0, "planted duplicate pairs must trigger the rule")
  }

  // ---- r15 (verdict ask #7): single-source knob edges ------------------

  test("single-doc source: minDocs=2 keeps everything, minDocs=1 drops every full chunk") {
    val body = s"$header ${toks(8, "solo")} extra tail"
    val rows = Seq((1L, "only", body))
    // the default threshold can never fire with one doc
    assert(run(rows)(1L) == ((2, 0, body)))
    // minDocs=1 makes every chunk hot in its own doc — both full chunks
    // drop, the 2-token tail survives (trailing-chunk immunity)
    assert(run(rows, minDocs = 1)(1L) == ((2, 2, "extra tail")))
  }

  test("minFrac=1.0 on a single source requires the chunk in EVERY doc") {
    val rows = Seq(
      (1L, "s", s"$header ${toks(8, "a")}"),
      (2L, "s", s"$header ${toks(8, "b")}"),
      (3L, "s", s"$header ${toks(8, "c")}"))
    val all = run(rows, minDocs = 2, minFrac = 1.0)
    assert((1L to 3L).forall(i => all(i)._2 == 1),
      "chunk in 3/3 docs passes the all-docs bar")
    val missingOne = rows.take(2) :+ ((3L, "s", toks(16, "c")))
    val out = run(missingOne, minDocs = 2, minFrac = 1.0)
    assert(out.values.forall(_._2 == 0),
      "chunk in 2/3 docs fails ceil(1.0*3)=3")
  }

  test("ceil boundary: 3 docs at minFrac=0.5 needs 2, not 1 (ceil(1.5)=2)") {
    val rows = Seq(
      (1L, "s", s"$header ${toks(8, "a")}"),
      (2L, "s", toks(16, "b")),
      (3L, "s", toks(16, "c")))
    // header in 1/3 docs: greatest(minDocs=1, ceil(0.5*3)=2) = 2 — kept
    val out = run(rows, minDocs = 1, minFrac = 0.5)
    assert(out.values.forall(_._2 == 0), "1/3 must fail the ceil(1.5)=2 bar")
    val rows2 = rows.updated(1, (2L, "s", s"$header ${toks(8, "b")}"))
    val out2 = run(rows2, minDocs = 1, minFrac = 0.5)
    assert(out2(1L)._2 == 1 && out2(2L)._2 == 1, "2/3 passes exactly at the bar")
  }

  test("chunk repeated within ONE doc counts once toward the doc threshold") {
    // doc 1 carries the header chunk TWICE; no other doc has it. The
    // posting threshold is countDistinct(doc_id), so 1 doc < minDocs=2:
    // nothing drops — a per-occurrence count would wrongly fire here
    val rows = Seq(
      (1L, "s", s"$header $header"),
      (2L, "s", toks(16, "z")))
    val out = run(rows)
    assert(out(1L) == ((2, 0, s"$header $header")))
    // but a second DOC with the chunk fires it, dropping BOTH positions
    // in doc 1 (the drop names the hash, every matching position goes)
    val out2 = run(rows :+ ((3L, "s", s"$header ${toks(8, "y")}")))
    assert(out2(1L) == ((2, 2, "")))
    assert(out2(3L) == ((2, 1, toks(8, "y"))))
  }
}
