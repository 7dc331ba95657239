package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** r15 (verdict ask #7): the auto-router's decision boundary, probed at
  * the exact crossover values. Two properties:
  *
  *  1. The DOC cutover is exact arithmetic (count(*) has no estimation
  *     error): 19,999 unique docs stay exact, 20,000 route. The DUP
  *     cutover reads an HLL approx-distinct (documented ±~2%), so for a
  *     corpus planted AT 25% duplicates the decision may legitimately go
  *     either way — what must hold is property 2.
  *  2. Boundary flips are OUTPUT-SAFE: on a corpus sitting at the dup
  *     cutover, the auto path's kept set equals canonicalDocsExact's
  *     whichever tier the (noisy) ratio picks — asserted by running auto
  *     with the REAL constants and comparing against the exact relation.
  *     (Planted duplicates are byte-identical, so the routed tier's
  *     digest-collapse catches them with no banding recall term.)
  */
class RouteStatsBoundarySpec extends SparkSpec {

  test("doc cutover binds exactly at 20000 (count is exact, no HLL term)") {
    def unique(n: Int) = spark.range(n)
      .selectExpr("id AS doc_id", "concat('unique doc ', id) AS text")
    val below = Dedup.routeStats(unique(Dedup.RoutedDocCutover.toInt - 1), "text")
    assert(below.nDocs == Dedup.RoutedDocCutover - 1 && !below.useRouted(),
      s"one doc under the cutover must stay exact: $below")
    val at = Dedup.routeStats(unique(Dedup.RoutedDocCutover.toInt), "text")
    assert(at.nDocs == Dedup.RoutedDocCutover && at.useRouted(),
      s"the cutover itself must route: $at")
  }

  test("dup-cutover boundary corpus: decision is noisy but output-safe") {
    import spark.implicits._
    // 1500 docs, exactly 25% of which are copies of earlier docs:
    // 1125 uniques + 375 duplicates — dupRatio sits ON RoutedDupCutover,
    // so the HLL estimate may land either side of it
    val rnd = new scala.util.Random(77)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc() = Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val uniques = Vector.tabulate(1125)(i => s"${doc()} u$i")
    val dups = Vector.tabulate(375)(i => uniques(i % 300))
    val texts = rnd.shuffle(uniques ++ dups)
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    val st = Dedup.routeStats(df, "text")
    // the estimate must at least be in the neighborhood (the ±2% claim,
    // with slack): true ratio is 0.25
    assert(math.abs(st.dupRatio - 0.25) < 0.05,
      s"HLL dup ratio estimate too far from planted 0.25: $st")

    // whatever tier the noisy ratio picked, the kept relation equals the
    // exact tier's — the boundary is correctness-neutral
    def kept(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.select(col("doc_id")).as[Long].collect().toSeq.sorted
    val viaAuto = kept(Dedup.canonicalDocsAuto(df, "doc_id", "text", 0.5))
    val viaExact = kept(Dedup.canonicalDocsExact(df, "doc_id", "text", 0.5))
    assert(viaAuto === viaExact,
      s"auto (picked routed=${st.useRouted()}) diverged from exact at the boundary")
    Dedup.releaseClassTable(df, "doc_id", "text")
    Dedup.releasePairTable(df, "doc_id", "text", 0.5)
  }
}
