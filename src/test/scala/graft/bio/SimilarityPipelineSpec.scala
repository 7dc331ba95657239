package graft.bio

import graft.SparkSpec

/** Flagship pipeline end-to-end on a synthetic genome: scan → suppress →
  * top-k → render → locate → sub-hits → span filter.
  */
class SimilarityPipelineSpec extends SparkSpec {

  private val rnd = new scala.util.Random(23)
  private def randomDna(n: Int): String = List.fill(n)("acgt"(rnd.nextInt(4))).mkString

  test("subRuns extracts best-count runs; '-' neither extends nor resets") {
    assert(SimilarityPipeline.subRuns("****", 4) === Seq((0, 3)))
    assert(SimilarityPipeline.subRuns("**.**", 2) === Seq((0, 1), (3, 4)))
    // '-' keeps the count: run spans the bridge (reference quirk)
    assert(SimilarityPipeline.subRuns("**-**", 4) === Seq((0, 4)))
    assert(SimilarityPipeline.subRuns("*.*.*", 2) === Nil)
    // runs longer than best emit once, at the prefix
    assert(SimilarityPipeline.subRuns("*****", 3) === Seq((0, 2)))
  }

  test("span filter: 5' orientation-aware window") {
    val fivePrimeFwd = Seq(LocationHit("5'", "g", "", 1000, 1200, true, "", ""))
    // forward gene at 1000: window [955, 1025]
    assert(SimilarityPipeline.passesSpanFilter(fivePrimeFwd, 960, 1000, Some((45, 25))))
    assert(!SimilarityPipeline.passesSpanFilter(fivePrimeFwd, 940, 1000, Some((45, 25))))
    val fivePrimeRev = Seq(LocationHit("5'", "g", "", 1200, 1000, true, "", ""))
    // reverse gene start 1200: window [1245 down-to 1175]
    assert(SimilarityPipeline.passesSpanFilter(fivePrimeRev, 1240, 1180, Some((45, 25))))
    assert(!SimilarityPipeline.passesSpanFilter(fivePrimeRev, 1260, 1180, Some((45, 25))))
    // non-5' first location always passes
    val cds = Seq(LocationHit("cds", "g", "", 1, 9, true, "", ""))
    assert(SimilarityPipeline.passesSpanFilter(cds, 0, 0, Some((45, 25))))
    // no filter configured: pass
    assert(SimilarityPipeline.passesSpanFilter(fivePrimeFwd, 0, 0, None))
  }

  test("end-to-end: planted motif hits, locates against annotations, emits sub-hits") {
    val motif = "acgtgcatgcaacctggtca"
    val pos = 700 // 0-based → 1-based start 701
    val genome = randomDna(pos) + motif + randomDna(2000 - pos - motif.length)
    // annotations: a gene covering the motif site, one upstream, one downstream
    val anns = Seq(
      InterRecord("up", "pu", 100, 300, isGene = true),
      InterRecord("host", "ph", 650, 800, isGene = true),
      InterRecord("down", "pd", 1500, 1700, isGene = true))

    val cfg = ScanConfig(weights = Map("consistency" -> 1.0), topK = 3,
      candidateDistance = 5, patience = 2, numChunks = 4)
    val (located, subs) = SimilarityPipeline.run(
      spark, genome, Seq("m" -> motif), anns, cfg, filterSubSpan = Some((45, 25)))

    val hits = located.collect()
    assert(hits.nonEmpty)
    val best = hits.maxBy(_.weightedSimilarity)
    assert(best.weightedSimilarity === motif.length.toDouble)
    assert(best.start === pos + 1)
    // perfect match → all-star track, classified inside the host gene
    assert(best.matchTrack === "*" * motif.length)
    assert(best.locations.exists(l => l.kind == "cds" && l.name == "host"))

    val subHits = subs.collect().filter(_.parentStart == best.start)
    assert(subHits.length === 1) // one maximal run == whole window
    assert(subHits.head.start === best.start)
    assert(subHits.head.end === best.end)
    assert(subHits.head.locations.nonEmpty)
  }

  test("reverse hit sub-run coordinates walk downward (start>end)") {
    val motif = "aaccggttacgtacgtggcc"
    val pos = 400
    val genome = randomDna(pos) + Dna.reverseComplement(motif) +
      randomDna(1500 - pos - motif.length)
    val cfg = ScanConfig(weights = Map("consistency" -> 1.0), topK = 2,
      candidateDistance = 5, patience = 2, numChunks = 2)
    val (located, subs) = SimilarityPipeline.run(
      spark, genome, Seq("m" -> motif), Seq(InterRecord("g", "", 1, 1500, isGene = true)), cfg)

    val best = located.collect().maxBy(_.weightedSimilarity)
    assert(best.start > best.end)
    val sub = subs.collect().filter(_.parentStart == best.start).head
    assert(sub.start === best.start)
    assert(sub.end === best.end) // full-window run, reverse orientation
    assert(sub.start > sub.end)
  }
}
