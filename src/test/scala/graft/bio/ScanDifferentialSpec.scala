package graft.bio

import graft.SparkSpec
import graft.io.GenBank
import scala.io.Source

/** THE end-to-end differential: the reference flagship scan
  * (`GeneSimilarityMatch.run` with consistency weights, top_k=100000,
  * candidate_distance=5, patience=2, 32 chunks) was EXECUTED on
  * `syn_genome.gb` (5 kb synthetic genome with two planted motifs) and its
  * complete 3,918-candidate output captured in `scan_goldens.tsv`. Our
  * GenBank parse + GenomeScan must reproduce the entire suppression-
  * surviving candidate set — every (gene, start, end, score), both
  * strands, exactly.
  */
class ScanDifferentialSpec extends SparkSpec {

  test("full scan distribution matches the executed reference (3918 candidates)") {
    val gb = GenBank.parse(Source.fromResource("syn_genome.gb").mkString)
    assert(gb.dna.length === 5000)

    val genes = Seq(
      "q1" -> "acgtacgtacgtacg",
      "q2" -> "ttgacagctagctaa")
    val cfg = ScanConfig(
      weights = Map("consistency" -> 1.0),
      topK = 100000,
      candidateDistance = 5,
      patience = 2,
      numChunks = 32)

    val got = GenomeScan.scan(spark, gb.dna, genes, cfg).collect()
      .map(h => (h.name, h.start, h.end, h.weightedSimilarity)).toSet

    val want = Source.fromResource("scan_goldens.tsv").getLines().drop(1).map { l =>
      val Array(name, s, e, sc) = l.split("\t")
      (name, s.toInt, e.toInt, sc.toDouble)
    }.toSet

    assert(want.size === 3918)
    val missing = want diff got
    val extra = got diff want
    assert(missing.isEmpty, s"missing ${missing.size} reference candidates, e.g. ${missing.take(5)}")
    assert(extra.isEmpty, s"extra ${extra.size} candidates not in reference, e.g. ${extra.take(5)}")
  }
}
