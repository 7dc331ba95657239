package graft.ann

import graft.{SparkEntry, SparkSpec}

/** r11: ANN recall measured on the REAL gate surface (the sf0.01 gate
  * queries vs the brute-force `ann_cosine_topk` truth) and RECORDED to
  * `RECALL.json` at the repo root — the pins prove the approximate
  * indexes are deterministic, this proves (and tracks, round over round,
  * as a committed diff) that they stay GOOD. A silent recall regression
  * now shows up twice: the per-query assert here, and the value diff in
  * the artifact.
  */
class AnnRecallSpec extends SparkSpec {

  /** Floors are REGRESSION TRIPWIRES set just under the r11 measured
    * values (lsh 0.15, ivf 0.61, hnsw 1.00, ivfpq 0.56) — not quality
    * targets. The sf0.01 embeddings are synthetic near-random vectors:
    * top-5 neighbor cosines are low, which is the documented worst case
    * for 8-bit×8-table hyperplane LSH (P[collide] = (1−θ/π)^bits decays
    * fast as θ grows — no cluster structure to catch). The same operator
    * at the same config measures ≥ 0.6 on the TextOpsSpec corpora, and
    * graph/quantizer methods (HNSW/IVF) hold 0.56–1.00 here precisely
    * because they adapt to the data. What this spec guards is the DIFF:
    * any code change that moves these values shows up in RECALL.json and,
    * past the floor, fails here.
    */
  private val approxQueries = Seq(
    "ann_lsh_topk" -> 0.10,
    "ann_lsh_mp_topk" -> 0.35, // measured 0.39 — 1-bit probes lift plain LSH's 0.15 by 2.6× on the same index
    "ann_ivf_topk" -> 0.50,
    "ann_hnsw_topk" -> 0.95,
    "ann_ivfpq_topk" -> 0.45)

  test("gate-surface recall vs brute force; values recorded to RECALL.json") {
    import spark.implicits._
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sf001)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = pairs("ann_cosine_topk")
    assert(brute.nonEmpty)
    val measured = approxQueries.map { case (name, floor) =>
      val approx = pairs(name)
      val recall = (brute intersect approx).size.toDouble / brute.size
      assert(recall >= floor, s"$name recall $recall below documented floor $floor")
      (name, recall, approx.size)
    }
    // multi-probe widens the candidate rule, so its recall can never fall
    // below plain LSH's — the algebraic claim, asserted on the real gates
    val byName = measured.map(m => m._1 -> m._2).toMap
    assert(byName("ann_lsh_mp_topk") >= byName("ann_lsh_topk"),
      s"multi-probe recall must dominate plain LSH: $byName")
    val json = measured.map { case (name, recall, rows) =>
      f"""    "$name": {"recall_vs_brute": $recall%.4f, "candidate_pairs": $rows}"""
    }.mkString(",\n")
    val content =
      s"""{
         |  "sf": "sf0.01",
         |  "truth": "ann_cosine_topk (exact brute-force top-k)",
         |  "metric": "recall@k over (query_id, neighbor_id) pairs",
         |  "brute_pairs": ${brute.size},
         |  "queries": {
         |$json
         |  }
         |}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("RECALL.json"),
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
