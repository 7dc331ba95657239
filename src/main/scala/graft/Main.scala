package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.bio._
import graft.io.{EcocycTsv, GenBank}
import graft.pipelines.{LocationReorder, NeighborPipeline, SimilarityMatchPipeline}

/** CLI — the reference's `run_*.py` entry points as subcommands with
  * arguments instead of module constants (SURVEY §7.1 step 6). A user of
  * the reference toolkit runs the same analyses here, file-to-file:
  *
  * {{{
  * graft.Main similarity-match --genome g.gb --genes genes.tsv --out dir
  *     [--top-k 20 --distance 5 --patience 2 --weights consistency=1,direct=2
  *      --chunks 32 --ascending]
  * graft.Main location-analysis --match m.txt --ecocyc e.tsv --out dir
  *     [--sub-span 45,25 --no-sub]
  * graft.Main cluster-match --input x.fna --rna-tag TAG --out dir
  * graft.Main gene-extract --genome g.gb --genes list.txt --out file
  * graft.Main gene-range --genome g.gb --out file
  * graft.Main location-reorder --location l.txt --index i.txt --out file
  * graft.Main neighbor --input req.txt --cache dir --out dir
  * }}}
  */
object Main {

  private def parseArgs(args: Array[String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"unexpected argument: $a")
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        out += a.drop(2) -> args(i + 1); i += 2
      } else {
        out += a.drop(2) -> "true"; i += 1
      }
    }
    out.result()
  }

  /** `--progress` attaches A6-style throttled stage/ETA logging
    * ([[graft.ops.Progress]]) for the lifetime of the run.
    */
  private var progressEnabled = false

  private def session(): SparkSession = {
    val s = SessionTuning(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    if (progressEnabled) graft.ops.Progress.attachStageProgress(s)
    s
  }

  private def read(path: String): String = Files.readString(Paths.get(path))
  private def write(path: String, text: String): Unit = {
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(path), text)
  }

  private def parseWeights(s: String): Map[String, Double] =
    s.split(",").map { kv => val Array(k, v) = kv.split("="); k -> v.toDouble }.toMap

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { println(usage); sys.exit(1) }
    val cmd = args.head
    val opts = parseArgs(args.tail)
    progressEnabled = opts.contains("progress")
    def req(k: String): String =
      opts.getOrElse(k, { System.err.println(s"missing --$k\n$usage"); sys.exit(2); "" })

    cmd match {
      case "similarity-match" =>
        val spark = session()
        val gb = GenBank.parse(read(req("genome")))
        val geneLines = read(req("genes")).linesIterator.toVector
        val header = geneLines.head.split("\t").zipWithIndex.toMap
        val genes = geneLines.tail.filter(_.nonEmpty).map { l =>
          val c = l.split("\t")
          (c(header("name")), c(header("gene")).toLowerCase)
        }
        val cfg = ScanConfig(
          weights = parseWeights(opts.getOrElse("weights", "consistency=1")),
          topK = opts.getOrElse("top-k", "20").toInt,
          candidateDistance = opts.getOrElse("distance", "5").toInt,
          patience = opts.getOrElse("patience", "2").toInt,
          ascending = opts.contains("ascending"),
          numChunks = opts.getOrElse("chunks", "32").toInt)
        val dataName = Paths.get(req("genome")).getFileName.toString.replace(".txt", "")
        val out = SimilarityMatchPipeline.run(spark, gb.dna, genes, cfg, dataName)
        write(s"${req("out")}/match_result.txt", out)
        spark.stop()

      case "location-analysis" =>
        val spark = session()
        val records = EcocycTsv.loadInterRecords(spark, req("ecocyc"))
        val span = opts.get("sub-span").map { s =>
          val Array(a, b) = s.split(","); (a.toInt, b.toInt)
        }
        val (main, sub) = LocationAnalysis.run(
          read(req("match")), records,
          processSubData = !opts.contains("no-sub"), filterSubSpan = span)
        write(s"${req("out")}/location_result.txt", main)
        if (!opts.contains("no-sub")) write(s"${req("out")}/sub_location_result.txt", sub)
        spark.stop()

      case "cluster-match" =>
        val blocks = ClusterMatch.parse(read(req("input")), req("rna-tag"))
        val clusters = ClusterMatch.cluster(blocks)
        val (all, only, _) = ClusterMatch.renderMemberResults(clusters)
        val dir = req("out")
        write(s"$dir/cluster_result.txt", ClusterMatch.renderClusterResult(clusters))
        write(s"$dir/sample_result.txt", ClusterMatch.renderSampleResult(clusters))
        write(s"$dir/all_result.txt", all)
        write(s"$dir/only_result.txt", only)

      case "gene-extract" if opts.get("mode").contains("range") =>
        val gb = GenBank.parse(read(req("genome")))
        write(req("out"),
          graft.pipelines.GeneExtractRange.run(gb.dna, read(req("genes"))))

      case "gene-extract" =>
        val gb = GenBank.parse(read(req("genome")))
        val sb = new StringBuilder("No\tgene\tfrom\t\tend\tproduct\tsequence\n")
        read(req("genes")).linesIterator.map(_.trim).filter(_.nonEmpty)
          .zipWithIndex.foreach { case (gene, i) =>
            gb.segments.filter(_.gene.contains(gene)).foreach { seg =>
              val seq = gb.dna.substring(seg.left - 1, seg.right)
              sb.append(s"d${i + 1}\t$gene\t${seg.left}\t${seg.right}\t${seg.product.getOrElse("None")}\t$seq\n")
            }
          }
        write(req("out"), sb.toString)

      case "gene-range" =>
        val gb = GenBank.parse(read(req("genome")))
        val rows = GeneOps.rangeRows(gb.segments, gb.dna.length)
        val sb = new StringBuilder("name\trange\tlocus_tag\n")
        rows.foreach { r =>
          sb.append(s"${r.name}\t${r.left}-${r.right}")
          r.locusTag.foreach(lt => sb.append(s"\t$lt"))
          if (r.name.startsWith("gene_") && r.locusTag.isEmpty) sb.append("\tnull")
          sb.append('\n')
        }
        write(req("out"), sb.toString)

      case "gene-stream" =>
        val gb = GenBank.parse(read(req("genome")))
        val mode = opts.getOrElse("mode", "rna")
        val out =
          if (mode == "rna")
            graft.pipelines.GeneStreamPipeline.runRna(
              read(req("input")), gb, opts.getOrElse("limit", "200").toInt)
          else
            graft.pipelines.GeneStreamPipeline.runInter(
              read(req("input")).linesIterator.toSeq, gb)
        write(req("out"), out)

      case "found-gene-near-range" =>
        val gb = GenBank.parse(read(req("genome")))
        write(req("out"),
          graft.pipelines.FoundGenePipeline.run(read(req("input")), gb))

      case "file-format" =>
        val spark = session()
        val eco = EcocycTsv.read(spark, req("ecocyc")).collect()
          .map(r => r.gene -> r).toMap
        write(req("out"), LocationTsv.formatTsv(read(req("input")), eco))
        spark.stop()

      case "gentamycin" =>
        // NCBI mode is reference parity; --atcc is the RECONSTRUCTED fix
        // of the reference's unrunnable ATCC branch (explicit opt-in — see
        // GentamycinPipeline scaladoc for the three upstream defects)
        val (mainOut, consistency) =
          if (opts.contains("atcc"))
            graft.pipelines.GentamycinPipeline.runAtcc(
              read(req("input")), graft.io.Fasta.parse(read(req("atcc-db"))))
          else
            graft.pipelines.GentamycinPipeline.run(
              read(req("input")), GenBank.parse(read(req("genome"))))
        write(s"${req("out")}/gentamycin_result.tsv", mainOut)
        write(s"${req("out")}/gentamycin_consistency.tsv", consistency)

      case "location-reorder" =>
        val (out, missing) = LocationReorder.run(
          read(req("location")),
          read(req("index")).linesIterator.toSeq)
        missing.foreach(m => System.err.println(s"$m not found in location file"))
        write(req("out"), out)

      case "neighbor" =>
        val cacheDir = req("cache")
        val requests = read(req("input")).linesIterator
          .filter(_.startsWith(">")).map(NeighborPipeline.parseRequest).toSeq
        val (nb, next, srcCounts, geneCounts) = NeighborPipeline.run(requests, { key =>
          val p = Paths.get(cacheDir, s"$key.txt")
          if (Files.exists(p)) Some(Files.readString(p)) else None
        })
        val dir = req("out")
        write(s"$dir/neighbor_result.txt", nb)
        write(s"$dir/next_neighbor_result.txt", next)
        write(s"$dir/source_count_result.txt", srcCounts)
        write(s"$dir/gene_count_result.txt", geneCounts)

      case "ecocyc-enrich" =>
        val cacheDir = req("cache")
        val (result, errors) = graft.pipelines.EcocycEnrichPipeline.run(
          read(req("input")), { name =>
            val p = Paths.get(cacheDir, name)
            if (Files.exists(p)) Some(Files.readString(p)) else None
          })
        write(s"${req("out")}/ecocyc_result.txt", result)
        write(s"${req("out")}/ecocyc_error.txt", errors)

      case "kegg" =>
        val cacheDir = req("cache")
        val cache = { name: String =>
          val p = Paths.get(cacheDir, name)
          if (Files.exists(p)) Some(Files.readString(p)) else None
        }
        val inputs = read(req("input")).linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
        val (result, errors) =
          if (opts.contains("by-kegg-id")) graft.pipelines.KeggPipeline.runForKeggIds(inputs, cache)
          else graft.pipelines.KeggPipeline.runForGenes(inputs, cache)
        write(s"${req("out")}/kegg_result.txt", result)
        write(s"${req("out")}/kegg_error.txt", errors)

      // corpus curation over a parquet documents dir (the training-data
      // extension surface): quality gate -> normalized dedup -> optional
      // embedding near-dup drop -> survivors + a per-language stats report
      case "curate" =>
        val spark = session()
        import org.apache.spark.sql.functions.col
        val dir = req("data")
        val out = req("out")
        val minQuality = opts.getOrElse("min-quality", "0.4").toDouble
        val semantic = opts.contains("semantic")
        // threshold threads INTO the pipeline (gate before representative
        // selection), not as a post-filter over the 0.4-gated registry
        // queries — a post-filter would drop clusters whose min-id
        // representative fails a stricter gate even when members pass
        val kept0 = graft.text.TextQueries.curateCorpus(spark, dir, minQuality)
        // --semantic routes through the measured brute/IVF decision
        // (curateSemanticAuto): exact brute sweep below the 10k
        // kept-embedding cutover, the IVF-bucketed path (probabilistic
        // drop recall, documented on the API) above it; --semantic-tier
        // exact|ivf|auto overrides for callers who need a guarantee
        val kept1 =
          if (!semantic) kept0
          else {
            val sem = opts.getOrElse("semantic-tier", "auto") match {
              case "exact" => graft.text.TextQueries.curateSemantic(spark, dir, minQuality)
              case "ivf"   => graft.text.TextQueries.curateSemanticIvf(spark, dir, minQuality)
              case "auto"  => graft.text.TextQueries.curateSemanticAuto(spark, dir, minQuality)
              case other =>
                System.err.println(s"--semantic-tier must be auto|exact|ivf, got '$other'\n$usage")
                sys.exit(2); null
            }
            kept0.join(sem.select(col("doc_id")), Seq("doc_id"), "left_semi")
          }
        // --decontaminate-below b: drop docs leaking benchmark shingles
        // (docs < b ARE the benchmark and leave the training set too);
        // always the bloom-prefiltered scale path — identical output to
        // the exact form, spec-pinned
        val kept = opts.get("decontaminate-below").map { v =>
          try v.toLong catch {
            case _: NumberFormatException =>
              System.err.println(s"--decontaminate-below needs a numeric doc id, got '$v'\n$usage")
              sys.exit(2); 0L
          }
        } match {
          case Some(b) => kept1.join(
            graft.text.TextQueries.decontaminateSurvivors(spark, dir, b, useBloom = true)
              .select(col("doc_id")), Seq("doc_id"), "left_semi")
          case None => kept1
        }
        kept.write.mode("overwrite").parquet(s"$out/survivors.parquet")
        // --redact-pii: the survivors' raw text with emails/phones/IPv4s
        // replaced by typed placeholders — the training-text artifact.
        // Survivor ids come from the parquet just written, NOT from
        // `kept`'s lineage: the unpersisted plan would re-run the whole
        // quality/dedup/semantic/decontamination pipeline a second time
        if (opts.contains("redact-pii")) {
          Tables.documents(spark, dir)
            .join(spark.read.parquet(s"$out/survivors.parquet").select("doc_id"),
              Seq("doc_id"), "left_semi")
            .select(col("doc_id"),
              graft.text.TextOps.piiRedact(col("text")).as("text"))
            .write.mode("overwrite").parquet(s"$out/redacted.parquet")
        }
        SparkEntry.queries("tx_length_quantiles")(spark, dir)
          .write.mode("overwrite").parquet(s"$out/lang_stats.parquet")
        println(s"[curate] survivors=${spark.read.parquet(s"$out/survivors.parquet").count()}")

      // the end-to-end corpus dedup a training pipeline runs daily:
      // pair table (from scratch, or COMPACTED: yesterday's Parquet ∪
      // today's incremental new-touching pairs) → connected components →
      // canonical survivors, every stage materialized for downstream jobs
      case "dedup" =>
        val spark = session()
        import org.apache.spark.sql.functions.col
        val dir = req("data")
        val out = req("out")
        val threshold = opts.getOrElse("threshold", "0.5").toDouble
        val docs = Tables.documents(spark, dir)
        // --routed: canonical-only FAST PATH through the three-stage
        // routing rule (digest-collapse → MinHash banding on reps → exact
        // verify on survivors; Dedup.componentsRouted). Writes
        // components.parquet + canonical.parquet with the exact path's
        // output, but never materializes the pair table — so it cannot
        // combine with --new-from, whose daily compaction loop IS the
        // pair-table artifact.
        // --auto: one cheap stats pass (count + HLL dup ratio) picks the
        // tier — the measured crossover rule (Dedup.routeStats)
        val autoRouted = opts.contains("auto") && {
          val st = graft.text.Dedup.routeStats(docs, "text")
          println(f"[dedup] auto route: nDocs=${st.nDocs} " +
            f"dupRatio=${st.dupRatio}%.3f routed=${st.useRouted()}")
          st.useRouted()
        }
        if (opts.contains("routed") || autoRouted) {
          require(!opts.contains("new-from"),
            "--routed has no pair table; the --new-from incremental loop needs one")
          try {
            graft.text.Dedup.componentsRouted(docs, "doc_id", "text", threshold)
              .write.mode("overwrite").parquet(s"$out/components.parquet")
          } finally graft.text.Dedup.releaseClassTable(docs, "doc_id", "text")
          // NO forced broadcast (r13 ADVICE): on a duplicate-heavy corpus
          // — the regime --routed exists for — the drop list is O(corpus)
          // and a forced broadcast collects it to the driver; AQE decides,
          // same as Dedup.canonicalDocsRouted's anti-join.
          val drop = spark.read.parquet(s"$out/components.parquet")
            .where(col("doc_id") =!= col("component")).select("doc_id")
          docs.join(drop, Seq("doc_id"), "left_anti")
            .write.mode("overwrite").parquet(s"$out/canonical.parquet")
          println(s"[dedup] routed canonical=" +
            s"${spark.read.parquet(s"$out/canonical.parquet").count()}")
          return
        }
        val hashed = graft.text.Dedup.hashedShingleDocs(docs, "doc_id", "text")
        val pairs = opts.get("new-from").map(_.toLong) match {
          case Some(b) =>
            // daily loop: reuse yesterday's old×old pair table if present,
            // build + materialize it otherwise; today's pairs are computed
            // incrementally (old×old never regenerated)
            val oldPath = s"$out/pairs_old.parquet"
            // pairs_old is refreshed to the FULL compacted table after
            // every run, so restrict it to old×old below TODAY's boundary:
            // compactPairTable's union is disjoint-by-construction (old
            // pairs never touch a new doc), and the incremental side owns
            // everything touching ids >= b. No-op when pairs_old was
            // freshly built from docs < b.
            val oldPairs =
              (if (Files.exists(Paths.get(oldPath))) spark.read.parquet(oldPath)
               else graft.text.Dedup.materializePairTable(
                 docs.where(col("doc_id") < b), "doc_id", "text", threshold, oldPath))
                .where(col("d1") < b && col("d2") < b)
            graft.text.Dedup.compactPairTable(
              hashed, col("doc_id") >= b, oldPairs, threshold)
          case None =>
            graft.text.Dedup.jaccardPairsHashed(hashed, threshold)
        }
        pairs.write.mode("overwrite").parquet(s"$out/pairs.parquet")
        val pairsBack = spark.read.parquet(s"$out/pairs.parquet")
        // today's full pair table is tomorrow's old×old: refresh pairs_old
        // so a later run with a LARGER --new-from doesn't pair against a
        // stale table that misses pairs formed between the two boundaries.
        // (Safe ordering: pairsBack reads pairs.parquet, already written.)
        // The refresh is write-temp-then-rename, and the LIVE table is only
        // ever touched by atomic renames: a crash mid-write leaves
        // yesterday's table intact; a crash between the two renames leaves
        // the directory ABSENT (next run rebuilds via the Files.exists
        // fallback above); the recursive delete runs only against the
        // trash name, whose partial remains are never read — never a
        // partial table the next run would trust.
        val oldFinal = Paths.get(s"$out/pairs_old.parquet")
        val oldTmp = Paths.get(s"$out/pairs_old.parquet._tmp")
        val oldTrash = Paths.get(s"$out/pairs_old.parquet._trash")
        deleteRecursively(oldTmp)
        deleteRecursively(oldTrash)
        pairsBack.write.mode("overwrite").parquet(oldTmp.toString)
        if (Files.exists(oldFinal))
          Files.move(oldFinal, oldTrash,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        Files.move(oldTmp, oldFinal,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(oldTrash)
        graft.text.Dedup.connectedComponents(pairsBack)
          .write.mode("overwrite").parquet(s"$out/components.parquet")
        val drop = spark.read.parquet(s"$out/components.parquet")
          .where(col("doc_id") =!= col("component")).select("doc_id")
        // AQE decides the anti-join strategy here too: the drop list is
        // only provably small on lightly-duplicated corpora
        docs.join(drop, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(s"$out/canonical.parquet")
        println(s"[dedup] pairs=${pairsBack.count()} " +
          s"canonical=${spark.read.parquet(s"$out/canonical.parquet").count()}")

      // train a BPE tokenizer on the corpus and encode every document:
      // merges.tsv is the deployable artifact (rank\tleft\tright — what a
      // streaming/serving encoder loads), encoded.parquet the token stream
      case "tokenize" =>
        val spark = session()
        import org.apache.spark.sql.functions.{col, size}
        val dir = req("data")
        val out = req("out")
        // --merges-in <file>: ENCODE with a frozen artifact instead of
        // training (the deployment path — the artifact a previous run or
        // another corpus trained); otherwise train here and write the
        // artifact beside the encoding
        val merges = opts.get("merges-in") match {
          case Some(path) => graft.text.Bpe.loadMerges(path)
          case None => graft.text.Bpe.train(Tables.documents(spark, dir),
            "text", opts.getOrElse("merges", "24").toInt).merges
        }
        Files.createDirectories(Paths.get(out))
        Files.writeString(Paths.get(s"$out/merges.tsv"),
          graft.text.Bpe.renderMerges(merges))
        Tables.documents(spark, dir)
          .select(col("doc_id"),
            graft.text.Bpe.encodeTokens(col("text"), merges).as("tokens"))
          .withColumn("n_tokens", size(col("tokens")))
          .write.mode("overwrite").parquet(s"$out/encoded.parquet")
        println(s"[tokenize] merges=${merges.length} " +
          s"docs=${spark.read.parquet(s"$out/encoded.parquet").count()}")

      // train the quality classifier and score the corpus: weights.tsv is
      // the deployable artifact, scored.parquet carries (logit, pred);
      // --min-logit writes the kept subset like curate's quality gate
      case "classify" =>
        val spark = session()
        import org.apache.spark.sql.functions.col
        val dir = req("data")
        val out = req("out")
        val docs = Tables.documents(spark, dir)
        val w = graft.text.QualityClassifier.train(docs, "text")
        Files.createDirectories(Paths.get(out))
        Files.writeString(Paths.get(s"$out/weights.tsv"),
          w.zipWithIndex.map { case (v, i) => s"w$i\t$v" }
            .mkString("", "\n", "\n"))
        val scored = docs.select(col("doc_id"),
            graft.text.QualityClassifier.logitColumn(col("text"), w).as("logit"))
          .withColumn("pred",
            org.apache.spark.sql.functions.when(col("logit") >= 0.0, 1)
              .otherwise(0))
        scored.write.mode("overwrite").parquet(s"$out/scored.parquet")
        opts.get("min-logit").foreach { v =>
          docs.join(
            spark.read.parquet(s"$out/scored.parquet")
              .where(col("logit") >= v.toDouble).select("doc_id"),
            Seq("doc_id"), "left_semi")
            .write.mode("overwrite").parquet(s"$out/kept.parquet")
        }
        println(s"[classify] scored=${spark.read.parquet(s"$out/scored.parquet").count()}")

      // BM25 top-k over the corpus for an ad-hoc --terms query (corpus
      // audit / decontamination triage): index-free, one scan
      case "search" =>
        val spark = session()
        val dir = req("data")
        val terms = req("terms").split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val k = opts.getOrElse("k", "20").toInt
        val docs = Tables.documents(spark, dir)
        val hits = graft.text.Retrieval.searchTopK(docs, "doc_id", "text", terms, k)
          .collect()
        hits.foreach { r => println(s"[search] ${r.getLong(0)}\t${r.getLong(1)}") }
        println(s"[search] terms=${terms.mkString(",")} hits=${hits.length}")

      // vector similarity search over the embeddings table — every ANN
      // family at its SHIPPED-DEFAULT preset (r17: measured ≥0.9
      // recall@5 at the 10× bracket for hnsw/ivf/mp-lsh — frontier in
      // RECALL_SF10DUP.json, per-SF rows in RECALL.json; pass no knobs,
      // get the recommended config). --method picks the index family;
      // hnsw callers at scale should also pass Ann.hnswShardsFor's
      // shard count (this CLI's corpora are small enough for the
      // default).
      case "ann-search" =>
        val spark = session()
        val dir = req("data")
        val k = opts.getOrElse("k", "5").toInt
        val ids = req("query-ids").split(",").map(_.trim.toLong).toSeq
        import org.apache.spark.sql.functions.{col, size => sizeF}
        val emb = Tables.embeddings(spark, dir)
        val pred = col("vec_id").isin(ids: _*)
        val dim = emb.select(sizeF(col("embedding"))).head().getInt(0)
        val method = opts.getOrElse("method", "ivf")
        val hits = (method match {
          case "brute" =>
            graft.ann.Ann.cosineTopK(emb, "vec_id", "embedding", pred, k)
          case "lsh" =>
            graft.ann.Ann.lshTopK(emb, "vec_id", "embedding", pred, k, dim)
          case "mplsh" =>
            graft.ann.Ann.lshMultiProbeTopK(emb, "vec_id", "embedding", pred, k, dim)
          case "ivf" =>
            graft.ann.Ann.ivfTopK(emb, "vec_id", "embedding", pred, k)
          case "ivfpq" =>
            graft.ann.Ann.ivfPqTopK(emb, "vec_id", "embedding", pred, k)
          case "hnsw" =>
            graft.ann.Ann.hnswTopK(emb, "vec_id", "embedding", pred, k)
          case "hnsw-routed" =>
            graft.ann.Ann.hnswRoutedTopK(emb, "vec_id", "embedding", pred, k)
          case other => sys.error(
            s"unknown --method $other (brute|lsh|mplsh|ivf|ivfpq|hnsw|hnsw-routed)")
        }).collect()
        hits.foreach { r =>
          println(s"[ann-search] q=${r.get(0)} rank=${r.get(1)} " +
            s"neighbor=${r.get(2)} score=${r.get(3)}")
        }
        println(s"[ann-search] method=$method k=$k queries=${ids.size} " +
          s"hits=${hits.length}")

      // the END-TO-END pretraining-data pipeline, composed from the
      // library stages a real corpus run chains: trained-classifier
      // quality gate → near-dup canonical dedup → (optional) benchmark
      // decontamination → PII redaction → BPE tokenizer training + encode
      // → context-window packing. Every stage is the same operator its
      // gate query verifies; artifacts (weights.tsv, merges.tsv,
      // packed.parquet) are the deployables
      case "pretrain" =>
        // the composition lives in graft.pipelines.Pretrain (shared with
        // the graded bench row — same stages, same artifacts)
        val spark = session()
        val res = graft.pipelines.Pretrain.run(spark, req("data"), req("out"),
          ctxLen = opts.getOrElse("context", "2048").toDouble,
          numMerges = opts.getOrElse("merges", "24").toInt,
          decontaminateBelow = opts.get("decontaminate-below").map(_.toLong),
          dedupStrategy = opts.getOrElse("dedup", "auto"),
          stripBoilerplate = opts.contains("strip-boilerplate"))
        println(s"[pretrain] input=${res.input} kept=${res.kept} " +
          s"packs=${res.packs} merges=${res.numMerges} " +
          s"dedup=${res.dedupTier} " +
          res.stages.map { case (n, sec) => f"$n=$sec%.2fs" }.mkString(" "))

      case other =>
        System.err.println(s"unknown command: $other\n$usage")
        sys.exit(2)
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }

  private val usage: String =
    """usage: graft.Main <command> --arg value ...
      |commands: similarity-match, location-analysis, cluster-match,
      |          gene-extract, gene-range, gene-stream, location-reorder,
      |          neighbor, ecocyc-enrich, kegg, found-gene-near-range,
      |          file-format, gentamycin,
      |          curate [--data sfDir --out dir --min-quality 0.4 --semantic
      |                  --semantic-tier auto|exact|ivf
      |                  --decontaminate-below id --redact-pii],
      |          dedup [--data sfDir --out dir --threshold 0.5 --new-from id
      |                 --routed | --auto],
      |          tokenize [--data sfDir --out dir --merges 24
      |                    --merges-in merges.tsv],
      |          classify [--data sfDir --out dir --min-logit x],
      |          search [--data sfDir --terms a,b,c --k 20],
      |          ann-search [--data sfDir --query-ids 1,2,3 --k 5
      |                      --method brute|lsh|mplsh|ivf|ivfpq|hnsw|hnsw-routed],
      |          pretrain [--data sfDir --out dir --context 2048 --merges 24
      |                    --decontaminate-below id --dedup auto|exact|routed
      |                    --strip-boilerplate]
      |(see Scaladoc for per-command arguments)""".stripMargin
}
