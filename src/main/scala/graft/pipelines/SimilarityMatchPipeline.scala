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
    */
  def run(
      spark: SparkSession,
      genome: String,
      genes: Seq[(String, String)],
      cfg: ScanConfig,
      dataName: String): String = {
    val hits = GenomeScan.scan(spark, genome, genes, cfg).collect()
    val rev = Dna.reverseComplement(genome)
    val batch = math.max(genome.length / cfg.numChunks, 1)
    val byGene = hits.groupBy(_.name)
    val sb = new StringBuilder
    genes.foreach { case (name, gene) =>
      val ordered = byGene.getOrElse(name, Array.empty)
        // reference order: stable sort desc = encounter order
        // (chunkIdx, strand, offset) among ties
        .sortBy(h => (-h.weightedSimilarity, h.left / batch, h.isReverse, h.left))
      var idx = 1
      ordered.foreach { h =>
        sb.append(renderBlock(idx, dataName, gene, h,
          if (h.isReverse) rev else genome, cfg))
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
    s"($idx)\n>$dataName/${h.start}-${h.end}\t$attrPart,$trackPart\n\n"
  }
}
