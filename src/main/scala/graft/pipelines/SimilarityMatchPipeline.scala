package graft.pipelines

import org.apache.spark.sql.SparkSession

import graft.bio._

/** Pipeline 1 — similarity match as a file-to-file program (reference
  * `GeneSimilarityMatch.run`, `gene_similarity_match.py:68-155`): scan the
  * genome for each query gene, render the top candidates as match-result
  * blocks. Byte-compatible with the reference output (asserted on the
  * synthetic-genome run).
  */
object SimilarityMatchPipeline {

  /** Reference kernel display order = SimilarityType enum order
    * (`similarity_type.py:5-10`), used for the render-track section;
    * attribute order follows the weights' insertion order.
    */
  private val enumOrder = Seq("text_edit", "direct", "consistency", "pattern", "blat")

  private def displayName(kernel: String): String = kernel match {
    case "text_edit" => "textedit"
    case k           => k
  }

  /** Run scan + render. `weights` is ordered (attribute column order).
    * `topK` etc. via cfg; `dataName` is the genome file's base name with
    * the reference's `.txt`-only strip.
    *
    * The per-hit render tracks (kernel re-evaluation against the genome)
    * are computed DISTRIBUTED, in the same Dataset as the scan, against
    * the already-broadcast genome; the driver only collects the final
    * block strings (bounded: ≤ topK×genes rows) and stitches them in the
    * reference's deterministic order with the per-gene running index.
    */
  def run(
      spark: SparkSession,
      genome: String,
      genes: Seq[(String, String)],
      cfg: ScanConfig,
      dataName: String): String = {
    import spark.implicits._
    val sc = spark.sparkContext
    val fwdB = sc.broadcast(genome)
    val revB = sc.broadcast(Dna.reverseComplement(genome))
    val genesB = sc.broadcast(genes.toMap)
    val cfgB = sc.broadcast(cfg)
    val rendered = GenomeScan.scan(spark, genome, genes, cfg)
      .mapPartitions { it =>
        val geneOf = genesB.value
        val c = cfgB.value
        it.map { h =>
          val db = if (h.isReverse) revB.value else fwdB.value
          (h.name, h.weightedSimilarity, h.isReverse, h.left,
            renderBody(dataName, geneOf(h.name), h, db, c))
        }
      }
      .collect()
    val batch = math.max(genome.length / cfg.numChunks, 1)
    val byGene = rendered.groupBy(_._1)
    val sb = new StringBuilder
    genes.foreach { case (name, _) =>
      val ordered = byGene.getOrElse(name, Array.empty)
        // reference order: stable sort desc = encounter order
        // (chunkIdx, strand, offset) among ties
        .sortBy { case (_, w, isRev, left, _) => (-w, left / batch, isRev, left) }
      var idx = 1
      ordered.foreach { case (_, _, _, _, body) =>
        sb.append(s"($idx)\n").append(body)
        idx += 1
      }
    }
    sb.toString
  }

  /** One `(idx)\n>data/start-end\tattrs,tracks\n\n` block (reference
    * `find_candidate_for_gene:111-155`).
    */
  def renderBlock(
      idx: Int,
      dataName: String,
      gene: String,
      h: ScanHit,
      db: String,
      cfg: ScanConfig): String =
    s"($idx)\n" + renderBody(dataName, gene, h, db, cfg)

  /** The block body after the `(idx)` line — everything that does not
    * depend on the per-gene running index, so executors can render it.
    */
  def renderBody(
      dataName: String,
      gene: String,
      h: ScanHit,
      db: String,
      cfg: ScanConfig): String = {
    val weightOrder = cfg.weights.keys.toSeq
    val attrs = Seq(
      "name" -> h.name,
      "direction" -> (if (h.isReverse) "-" else "+"),
      "weighted_similarity" -> f"${h.weightedSimilarity}%.2f") ++
      weightOrder.filter(k => h.scores.contains(k)).map { k =>
        s"${displayName(k)}_similarity" -> f"${h.scores(k)}%.2f"
      } ++ Seq("original      :" -> gene)

    val tracks = enumOrder.filter(k => cfg.weights.getOrElse(k, 0.0) > 0).flatMap { k =>
      val r = k match {
        case "direct"      => SimilarityKernels.directRender(gene, db, h.left)
        case "text_edit"   => SimilarityKernels.textEditRender(gene, db, h.left)
        case "consistency" => SimilarityKernels.consistencyRender(gene, db, h.left, cfg.patience)
        case "pattern"     => SimilarityKernels.directRender(gene, db, h.left) // reference pattern render = direct marks
        case "blat"        => SimilarityKernels.blatRender(gene, db, h.left)
      }
      val p = displayName(k)
      Seq(s"${p}_gene_format   :" -> r.gene,
        s"${p}_target_format :" -> r.target,
        s"${p}_match_format  :" -> r.marks)
    }

    val attrPart = attrs.map { case (k, v) => s"$k=$v" }.mkString(",")
    val trackPart = tracks.map { case (k, v) => s"$k=$v" }.mkString(",")
    s">$dataName/${h.start}-${h.end}\t$attrPart,$trackPart\n\n"
  }
}
