package graft.pipelines

import java.util.zip.GZIPInputStream

import graft.SparkSpec
import graft.bio.ScanConfig
import graft.io.GenBank

/** Pipeline-1 byte differential: the rendered match-result file must equal
  * the output of the EXECUTED reference `GeneSimilarityMatch.run` on the
  * synthetic genome (stored gzipped; header prefix re-normalized the same
  * way the location fixture was).
  */
class SimilarityMatchPipelineSpec extends SparkSpec {

  test("match-result render is byte-identical to the executed reference") {
    val gz = new GZIPInputStream(
      getClass.getClassLoader.getResourceAsStream("syn_match_result.txt.gz"))
    val want = scala.io.Source.fromInputStream(gz, "UTF-8").mkString

    val gb = GenBank.parse(scala.io.Source.fromResource("syn_genome.gb").mkString)
    val genes = Seq("q1" -> "acgtacgtacgtacg", "q2" -> "ttgacagctagctaa")
    val cfg = ScanConfig(weights = Map("consistency" -> 1.0), topK = 100000,
      candidateDistance = 5, patience = 2, numChunks = 32)
    val got = SimilarityMatchPipeline.run(spark, gb.dna, genes, cfg, "NC_SYN.1")

    assert(got.length === want.length, s"length ${got.length} vs ${want.length}")
    assert(got === want)
  }
}
