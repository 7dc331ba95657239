package graft.ann

import graft.{SparkEntry, SparkSpec}

/** r11: ANN recall measured on the REAL gate surface (the gate queries vs
  * the brute-force `ann_cosine_topk` truth) and RECORDED to `RECALL.json`
  * at the repo root — the pins prove the approximate indexes are
  * deterministic, this proves (and tracks, round over round, as a
  * committed diff) that they stay GOOD. A silent recall regression now
  * shows up twice: the per-query assert here, and the value diff in the
  * artifact.
  *
  * r13 (verdict ask #5): measured at BOTH sf0.01 (500 corpus embeddings)
  * and sf0.1 (5k corpus embeddings) — index quality where shards, beam
  * width, and probe counts actually bind is a property of the larger
  * corpus, and the r12 artifact only recorded the small one.
  */
class AnnRecallSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"

  /** Floors are REGRESSION TRIPWIRES set just under the measured values —
    * not quality targets. The synthetic embeddings are near-random
    * vectors: top-5 neighbor cosines are low, which is the documented
    * worst case for 8-bit×8-table hyperplane LSH (P[collide] =
    * (1−θ/π)^bits decays fast as θ grows — no cluster structure to
    * catch). The same operator at the same config measures ≥ 0.6 on the
    * TextOpsSpec corpora; graph/quantizer methods (HNSW/IVF) adapt to
    * the data. What this spec guards is the DIFF: any code change that
    * moves these values shows up in RECALL.json and, past the floor,
    * fails here.
    *
    * sf0.1 measured (r13): lsh 0.13, mp-lsh 0.46, ivf 0.58, hnsw 1.00,
    * ivfpq 0.36. The 10× corpus does NOT uniformly hurt: HNSW stays
    * perfect (its beam search adapts to local density) and MULTI-PROBE
    * RISES 0.39 → 0.46 — denser buckets mean each 1-bit-flip probe
    * surfaces more true neighbors. The real casualty is IVF-PQ
    * (0.56 → 0.36): with nlist fixed, 10× more vectors per cell makes
    * the quantized SHORTLIST the bottleneck (the re-rank is already
    * exact) — AnnPqTuneProbe measures the knobs buying it back
    * (candidateFactor=32/nProbe=8 → 0.74, cf=64/nProbe=16 → 0.93, wall
    * unchanged; table in ARCHITECTURE). Floors sit just under the
    * gate-config measurements.
    */
  private val approxFloors: Seq[(String, Map[String, Double])] = Seq(
    "sf0.01" -> Map(
      "ann_lsh_topk" -> 0.10,
      "ann_lsh_mp_topk" -> 0.35, // measured 0.39 — 1-bit probes lift plain LSH's 0.15 by 2.6× on the same index
      "ann_ivf_topk" -> 0.50,
      "ann_hnsw_topk" -> 0.95,
      "ann_hnsw_routed" -> 0.65, // measured 0.69 — pedagogical 8-cell/probe-4: half the cells probed, the structureless fraction bound + the planted-dup bonus
      "ann_hnsw_auto" -> 0.95,   // r18: gate batch re-covers the cells -> fan-out branch == ann_hnsw_topk
      "ann_hnsw_index" -> 0.65,  // r18: standing index == ann_hnsw_routed by the equality contract
      "ann_hnsw_index_inc" -> 0.65, // r18.5: build-then-insert == the same relation (maintenance bit-identity)
      // ann_hnsw_index_compact is deliberately NOT floored here: it
      // serves a 20%-tombstoned relation, so recall vs the FULL-corpus
      // brute is structurally capped (~0.64 of brute pairs reachable) —
      // its correctness surface is the hash gate + the bit-identity
      // specs, not a recall bar
      "ann_ivfpq_topk" -> 0.45),
    "sf0.1" -> Map(
      "ann_lsh_topk" -> 0.08,
      "ann_lsh_mp_topk" -> 0.38,
      "ann_ivf_topk" -> 0.50,
      "ann_hnsw_topk" -> 0.95,
      "ann_hnsw_routed" -> 0.70, // measured 0.74
      "ann_hnsw_auto" -> 0.95,
      "ann_hnsw_index" -> 0.70,
      "ann_hnsw_index_inc" -> 0.70,
      "ann_ivfpq_topk" -> 0.28))

  test("gate-surface recall vs brute force at sf0.01 AND sf0.1; recorded to RECALL.json") {
    import spark.implicits._
    val sections = Seq(("sf0.01", sf001), ("sf0.1", sf01)).map { case (label, dir) =>
      def pairs(name: String): Set[(Long, Long)] =
        SparkEntry.queries(name)(spark, dir)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val brute = pairs("ann_cosine_topk")
      assert(brute.nonEmpty)
      val floors = approxFloors.find(_._1 == label).get._2
      val measured = floors.toSeq.sortBy(_._1).map { case (name, floor) =>
        val approx = pairs(name)
        val recall = (brute intersect approx).size.toDouble / brute.size
        assert(recall >= floor,
          s"$name recall $recall below documented floor $floor at $label")
        (name, recall, approx.size)
      }
      // multi-probe widens the candidate rule, so its recall can never
      // fall below plain LSH's — the algebraic claim, on the real gates
      val byName = measured.map(m => m._1 -> m._2).toMap
      assert(byName("ann_lsh_mp_topk") >= byName("ann_lsh_topk"),
        s"multi-probe recall must dominate plain LSH at $label: $byName")
      // r14 (verdict ask #4): the SHIPPED ivfPqTopK default config
      // (cf=32, nProbe=8 — the AnnPqTuneProbe buy-back) measured and
      // recorded BESIDE the gate's pedagogical cf=8/nProbe=4, so the
      // artifact shows what callers actually get (0.74-class at sf0.1,
      // vs the gate config's 0.36)
      val shipped = {
        import org.apache.spark.sql.functions.col
        graft.ann.Ann.ivfPqTopK(graft.Tables.embeddings(spark, dir),
            "vec_id", "embedding", col("vec_id") < 20, k = 5)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      }
      val shippedRecall = (brute intersect shipped).size.toDouble / brute.size
      // r18 preset (64/32/m16/ks256/cf64) measured 0.95/0.92 here and
      // 0.940 at the 10× bracket — floors just under, as everywhere
      val shippedFloor = 0.88
      assert(shippedRecall >= shippedFloor,
        s"shipped ivfPqTopK default recall $shippedRecall below floor " +
          s"$shippedFloor at $label")
      // r15 (verdict ask #2): the remaining families' SHIPPED defaults —
      // the AnnPresetTuneProbe-measured presets that are now the method
      // signature defaults (lsh 4×16, mp-lsh 6×16, ivf nProbe=8/16) —
      // measured beside their pedagogical gate configs with tripwire
      // floors set just under the measurements (lsh 0.63/0.73,
      // mp 0.69/0.84, ivf 0.84/0.84)
      val emb = graft.Tables.embeddings(spark, dir)
      def shippedPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      import org.apache.spark.sql.functions.col
      // r17 floors track the RecallFrontierProbe preset refresh (mp-lsh
      // 6×16×2-bit measured 0.92/0.97, ivf 64/32 measured 0.95/0.92,
      // hnsw m=16/ef=128 measured 1.00/1.00 here) — floors sit just
      // under the measurements, as before
      val moreShipped = Seq(
        ("ann_lsh_topk_shipped_default",
          shippedPairs(graft.ann.Ann.lshTopK(emb, "vec_id", "embedding",
            col("vec_id") < 20, k = 5, dim = 64)),
          if (label == "sf0.01") 0.55 else 0.65),
        ("ann_lsh_mp_topk_shipped_default",
          shippedPairs(graft.ann.Ann.lshMultiProbeTopK(emb, "vec_id",
            "embedding", col("vec_id") < 20, k = 5, dim = 64)),
          if (label == "sf0.01") 0.85 else 0.90),
        ("ann_ivf_topk_shipped_default",
          shippedPairs(graft.ann.Ann.ivfTopK(emb, "vec_id", "embedding",
            col("vec_id") < 20, k = 5)),
          0.88),
        ("ann_hnsw_topk_shipped_default",
          shippedPairs(graft.ann.Ann.hnswTopK(emb, "vec_id", "embedding",
            col("vec_id") < 20, k = 5)),
          0.95),
        // routed hnsw shipped default (r17.5): 64 cells / probe 32 — the
        // structureless-safe 0.5 fraction (RECALL_SF10DUP routed section);
        // measured 0.95/0.92
        ("ann_hnsw_routed_shipped_default",
          shippedPairs(graft.ann.Ann.hnswRoutedTopK(emb, "vec_id",
            "embedding", col("vec_id") < 20, k = 5)),
          0.88)
      ).map { case (name, pairsGot, floor) =>
        val r = (brute intersect pairsGot).size.toDouble / brute.size
        assert(r >= floor, s"$name recall $r below floor $floor at $label")
        (name, r, pairsGot.size)
      }
      // shipped presets must dominate their own pedagogical gate configs
      val gateByName = measured.map(m => m._1 -> m._2).toMap
      val shipByName = moreShipped.map(m => m._1 -> m._2).toMap
      assert(shipByName("ann_lsh_topk_shipped_default") >=
        gateByName("ann_lsh_topk"), "lsh preset must beat the gate config")
      assert(shipByName("ann_ivf_topk_shipped_default") >=
        gateByName("ann_ivf_topk"), "ivf preset must beat the gate config")
      val withShipped = measured ++ moreShipped :+
        (("ann_ivfpq_topk_shipped_default", shippedRecall, shipped.size))
      // r19 (r18 verdict ask #6): every row carries its ROLE so the
      // pinned pedagogical gate configs (e.g. ivfpq 0.36 at sf0.1)
      // cannot be misread as shipped quality next to the
      // *_shipped_default rows; the single-probe-LSH ceiling statement
      // lives in the artifact itself, not just COVERAGE prose.
      val json = withShipped.map { case (name, recall, rows) =>
        val role =
          if (name.endsWith("_shipped_default")) "shipped-default"
          else "gate-pinned"
        val note =
          if (name == "ann_lsh_topk" || name == "ann_lsh_topk_shipped_default")
            """, "role_note": "pedagogical baseline: measured single-probe ceiling 0.82 at the 10x bracket (RECALL_SF10DUP.json) - prefer lshMultiProbeTopK, 0.968 on the same index""""
          else ""
        f"""      "$name": {"recall_vs_brute": $recall%.4f, "candidate_pairs": $rows, "role": "$role"$note}"""
      }.mkString(",\n")
      s"""    "$label": {
         |      "brute_pairs": ${brute.size},
         |$json
         |    }""".stripMargin
    }
    // r17 (verdict ask #1): the 10× bracket rows ride in from the
    // committed RECALL_SF10DUP.json fragment (measured by
    // RecallFrontierProbe on the 200k×64 corpus, which the suite cannot
    // regenerate cheaply) — merged here so RECALL.json stays the single
    // recall artifact, with the fragment's floors RE-CHECKED against its
    // recorded values every suite run: an accidental edit that drops a
    // shipped default below its floor fails here, and a code change that
    // drops the MEASURED recall fails in the probe's own floor asserts.
    val sf10Section = {
      val fragPath = java.nio.file.Paths.get("RECALL_SF10DUP.json")
      if (!java.nio.file.Files.exists(fragPath)) ""
      else {
        val frag = java.nio.file.Files.readString(fragPath)
        val row = ("\"([a-z0-9_]+)\":\\s*\\{\"recall_vs_brute\":\\s*([0-9.]+)," +
          "\\s*\"wall_sec\":\\s*([0-9.]+),\\s*\"config\":\\s*\"([^\"]+)\"," +
          "[^}]*\"floor\":\\s*([0-9.]+)\\}").r
        val rows = row.findAllMatchIn(frag).map(m =>
          (m.group(1), m.group(2).toDouble, m.group(4), m.group(5).toDouble)).toSeq
        assert(rows.size >= 3,
          "RECALL_SF10DUP.json present but shipped-default rows failed to parse")
        rows.foreach { case (name, recall, _, floor) =>
          assert(recall >= floor,
            s"committed sf10dup row $name records recall $recall below its " +
              s"own floor $floor — rerun RecallFrontierProbe; do not edit " +
              "the fragment by hand")
        }
        val json = rows.map { case (name, recall, config, _) =>
          f"""      "$name": {"recall_vs_brute": $recall%.4f, "config": "$config", "role": "frontier-10x"}"""
        }.mkString(",\n")
        s""",
           |    "sf10dup (200k x 64, RECALL_SF10DUP.json)": {
           |$json
           |    }""".stripMargin
      }
    }
    val content =
      s"""{
         |  "truth": "ann_cosine_topk (exact brute-force top-k)",
         |  "metric": "recall@k over (query_id, neighbor_id) pairs",
         |  "roles": {
         |    "gate-pinned": "the deliberately small pedagogical config the hash gate pins (oracle tractability, NOT shipped quality)",
         |    "shipped-default": "what a caller gets from the method-signature defaults",
         |    "frontier-10x": "shipped defaults re-measured at the 200k x 64 bracket (RECALL_SF10DUP.json)"
         |  },
         |  "by_sf": {
         |${sections.mkString(",\n")}$sf10Section
         |  }
         |}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("RECALL.json"),
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
