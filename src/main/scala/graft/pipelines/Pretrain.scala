package graft.pipelines

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, floor, size}

import graft.Tables

/** The end-to-end pretraining data pipeline (the `Main pretrain` CLI body,
  * factored out so the bench can run the same composition as a graded
  * row): trained quality gate → near-dup canonical dedup → optional
  * Bloom decontamination → PII redaction → BPE train/encode →
  * context-window packing. Artifacts land under `out` exactly as the CLI
  * documents (weights.tsv, clean.parquet, merges.tsv, packed.parquet).
  *
  * Stage timings are reported at ACTION granularity — the pipeline is
  * lazy, so a "stage" is what one materialization pays for: the classifier
  * fit (bounded driver collect), the clean.parquet write (gate + dedup +
  * decontaminate + redact in one pass chain), the BPE vocab fit (bounded
  * collect + driver merge loop), and the packed.parquet write (native
  * encode + distributed prefix-sum pack). Finer-grained numbers would
  * require extra actions that re-run lineage — the honest breakdown is
  * the one the execution actually has.
  */
object Pretrain {

  final case class Result(
      input: Long, kept: Long, packs: Long, numMerges: Int,
      stages: Seq[(String, Double)], dedupTier: String = "routed")

  /** @param dedupStrategy `"auto"` (default — [[graft.text.Dedup.routeStats]]
    *   picks the tier from one cheap stats pass: exact below the measured
    *   crossover, routed above it or on duplicate-heavy corpora),
    *   `"exact"` (guaranteed exact-tier output at any threshold), or
    *   `"routed"` (force the three-stage 100 TB route). NOTE the routed
    *   tier's recall is PROBABILISTIC: it equals the exact tier only when
    *   the MinHash banding catches every true rep pair — P[miss] =
    *   (1−J^r)^b per pair, ≈1% for a borderline J=0.5 pair at 32 hashes /
    *   16 bands — so near-threshold duplicates can survive into training
    *   data; callers who need guaranteed exact-tier output pass "exact".
    */
  /** @param stripBoilerplate when set, per-source boilerplate chunks are
    *   stripped from the quality-kept docs BEFORE dedup (the RefinedWeb
    *   order — shared crawl chrome otherwise inflates near-dup
    *   similarity and survives into training text). The quality gate
    *   still scores the ORIGINAL text (the classifier was trained on
    *   it); its cost lands in the clean-write stage (lazy lineage).
    */
  def run(
      spark: SparkSession,
      dataDir: String,
      out: String,
      ctxLen: Double = 2048,
      numMerges: Int = 24,
      decontaminateBelow: Option[Long] = None,
      dedupStrategy: String = "auto",
      stripBoilerplate: Boolean = false): Result = {
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def stage[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val v = f
      stages += name -> (System.nanoTime() - t0) / 1e9
      v
    }
    val docs = Tables.documents(spark, dataDir)
    Files.createDirectories(Paths.get(out))

    // 1. trained quality gate (logit >= 0 = the classifier's keep side)
    val w = stage("classifier_fit") {
      graft.text.QualityClassifier.train(docs, "text")
    }
    Files.writeString(Paths.get(s"$out/weights.tsv"),
      w.zipWithIndex.map { case (v, i) => s"w$i\t$v" }
        .mkString("", "\n", "\n"))
    val gated = docs.where(
      graft.text.QualityClassifier.logitColumn(col("text"), w) >= 0.0)

    // 1.5 optional per-source boilerplate strip (see the param scaladoc)
    val kept =
      if (stripBoilerplate)
        graft.text.TextOps.stripBoilerplate(gated)
          .select(col("doc_id"), col("clean_text").as("text"))
      else gated

    // 2. near-dup canonical dedup among the kept docs. Tier per
    // `dedupStrategy` (see the run() scaladoc for the recall contract):
    // the routed path (digest-collapse → MinHash banding on reps → exact
    // verify on survivors) measured 3× faster at sf1 and 14× on the
    // duplicate-heavy bracket; the exact pair table wins below the
    // crossover and has no banding recall term; auto decides from one
    // stats pass over the kept docs.
    val tier = dedupStrategy match {
      case "auto" => stage("route_stats") {
        // an eager stats scan over the kept docs — timed as its own
        // stage so the decision's cost is visible in the breakdown
        if (graft.text.Dedup.routeStats(kept, "text").useRouted()) "routed"
        else "exact"
      }
      case t @ ("routed" | "exact") => t
      case other => throw new IllegalArgumentException(
        s"dedupStrategy must be auto|routed|exact, got $other")
    }
    val canon =
      if (tier == "routed")
        graft.text.Dedup.canonicalDocsRouted(kept, "doc_id", "text", 0.5)
      else graft.text.Dedup.canonicalDocsExact(kept, "doc_id", "text", 0.5)

    // 3. optional decontamination (bloom scale path, curate's flag)
    val clean = decontaminateBelow match {
      case Some(b) => canon.join(
        graft.text.TextQueries.decontaminateSurvivors(spark, dataDir, b, useBloom = true)
          .select(col("doc_id")), Seq("doc_id"), "left_semi")
      case None => canon
    }

    // 4. PII redaction — the text every later stage (and training) sees.
    // The clean write is the last consumer of the dedup lineage: release
    // the routed path's memoized collapsed-class seam in a FINALLY so a
    // failed write cannot leak persisted blocks into a long-lived session
    // (stages 5-6 read clean.parquet back, never this lineage)
    try {
      stage("gate_dedup_redact_write") {
        clean.select(col("doc_id"),
            graft.text.TextOps.piiRedact(col("text")).as("text"))
          .write.mode("overwrite").parquet(s"$out/clean.parquet")
      }
    } finally {
      // release whichever memoized dedup seam the chosen tier built
      // (both calls are no-ops for the tier that did not run), plus the
      // boilerplate posting seam when --strip-boilerplate persisted one
      // (no-op when the flag is off)
      graft.text.Dedup.releaseClassTable(kept, "doc_id", "text")
      graft.text.Dedup.releasePairTable(kept, "doc_id", "text", 0.5)
      if (stripBoilerplate) graft.text.TextOps.releaseBoilerPostings(gated)
    }

    // 5. tokenizer trains on the CLEANED corpus (what it will encode)
    val cleanBack = spark.read.parquet(s"$out/clean.parquet")
    val trained = stage("bpe_fit") {
      graft.text.Bpe.train(cleanBack, "text", numMerges)
    }
    Files.writeString(Paths.get(s"$out/merges.tsv"),
      graft.text.Bpe.renderMerges(trained.merges))
    val encoded = cleanBack.select(col("doc_id"),
        graft.text.Bpe.encodeTokens(col("text"), trained.merges).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))

    // 6. context-window packing over the BPE counts
    stage("encode_pack_write") {
      graft.ops.PrefixSum.withRunningTotal(encoded, "n_tokens", "running", col("doc_id"))
        .withColumn("pack_id",
          floor((col("running") - col("n_tokens")) / ctxLen).cast("long"))
        .write.mode("overwrite").parquet(s"$out/packed.parquet")
    }

    val packedBack = spark.read.parquet(s"$out/packed.parquet")
    val (input, keptN, packs) = stage("counts") {
      (docs.count(), packedBack.count(),
        packedBack.select("pack_id").distinct().count())
    }
    Result(input, keptN, packs, trained.merges.length, stages.toSeq, tier)
  }
}
