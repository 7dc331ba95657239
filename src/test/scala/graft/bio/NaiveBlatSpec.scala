package graft.bio

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** r12: full differential for the `x5_blat_text` pin — the production DFS
  * kernel must equal the declarative [[NaiveBlat]] reformulation at every
  * (db, offset) over three domains: the gate's own corpus mapping at two
  * SFs, a deterministic synthetic DNA sweep with varied budgets, and
  * adversarial hand shapes (db-end truncation, budget boundaries, wobble
  * c≈t asymmetry). The pin stays (cheap per-round non-regression); this
  * makes it corroborated rather than self-referential.
  */
class NaiveBlatSpec extends SparkSpec {
  import spark.implicits._

  private def toDna(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) { sb.append("acgt".charAt(text.charAt(i) % 4)); i += 1 }
    sb.toString
  }

  private def diffAllOffsets(gene: String, db: String,
      midLimit: Int = 10, endLimit: Int = 2): Unit = {
    var o = 0
    while (o < db.length) {
      val got = SimilarityKernels.blatSimilarity(gene, db, o, midLimit, endLimit)
      val want = NaiveBlat.blatSimilarity(gene, db, o, midLimit, endLimit)
      assert(got == want,
        s"divergence at offset $o (mid=$midLimit end=$endLimit) db=$db: " +
          s"kernel=$got naive=$want")
      o += 1
    }
  }

  test("kernel equals naive at every offset of the gate corpus (sf0.001 + sf0.01)") {
    Seq(sf0001, sf001).foreach { dir =>
      val texts = Tables.documents(spark, dir)
        .select(col("text")).as[String].collect()
      assert(texts.nonEmpty)
      texts.foreach { t =>
        val db = toDna(t)
        // full (ok, end) parity at every offset, not just the sweep range
        if (db.length > 8) diffAllOffsets("gattacca", db)
      }
      // and the gate's exact aggregate
      texts.foreach { t =>
        val db = toDna(t)
        assert(SimilarityKernels.blatSweep("gattacca", db) ==
          NaiveBlat.blatSweep("gattacca", db))
      }
    }
  }

  test("kernel equals naive on a synthetic sweep with varied budgets") {
    val rnd = new scala.util.Random(1234)
    val genes = Seq("gattacca", "cccccccc", "acgtacgt", "ttttgggg")
    (1 to 120).foreach { _ =>
      val db = (0 until (20 + rnd.nextInt(120)))
        .map(_ => "acgt"(rnd.nextInt(4))).mkString
      val gene = genes(rnd.nextInt(genes.length))
      val mid = rnd.nextInt(12)
      val end = rnd.nextInt(4)
      diffAllOffsets(gene, db, mid, end)
    }
  }

  test("kernel equals naive on adversarial boundary shapes") {
    // db-end truncation mid-half, exact budget boundaries, wobble c->t,
    // anchors that fail then succeed (the backtracking path)
    val shapes = Seq(
      "gattacca",            // exact hit
      "gatt" + "acca",       // trivial split
      "gat",                 // too short to enter phase B
      "gattac",              // ends mid second half
      "ga" + "x" * 10 + "ttacca", // long skip run in the first half
      "gatt" + "x" * 11 + "acca", // phase-B budget edge (11 > midLimit at anchor)
      "gatt" + "x" * 10 + "acca", // phase-B budget edge (exactly at limit)
      "gattaxca",            // one insert in the end half
      "gattaxxca",           // two inserts in the end half (endLimit edge)
      "gattaxxxca",          // three inserts (over endLimit)
      "tattacca",            // wobble: query g vs t does NOT match
      "gattatta",            // query c over db t DOES match (c~t wobble)
      "gatta",               // truncated right at phase C entry
      "gattaccagattacca",    // two anchor candidates, first succeeds
      // momentum decisive: first-half matches all isolated (a/t/t at
      // +2/+4/+6, head skipped) -> reject, though an anchor + clean end
      // half follows; any relaxation of the adjacency rule accepts
      "gzaztztzacca",
      // same shape but momentum satisfied via head (a at start): accept
      "gaztztzacca")
    shapes.foreach { db =>
      if (db.nonEmpty) diffAllOffsets("gattacca", db)
      if (db.nonEmpty) diffAllOffsets("gattacca", db, midLimit = 0, endLimit = 0)
    }
  }
}
