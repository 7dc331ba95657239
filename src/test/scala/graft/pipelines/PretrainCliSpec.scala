package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, explode}

/** The `pretrain` composition end-to-end on real tables: each stage's
  * defining invariant holds on the artifacts it writes.
  */
class PretrainCliSpec extends SparkSpec {
  import spark.implicits._

  test("pretrain: quality gate, dedup, tokenize, pack invariants all hold") {
    val out = java.nio.file.Files.createTempDirectory("pre_out").toString
    graft.Main.main(Array("pretrain", "--data", sf0001, "--out", out))
    val docs = graft.Tables.documents(spark, sf0001)
    val clean = spark.read.parquet(s"$out/clean.parquet")
    val packed = spark.read.parquet(s"$out/packed.parquet")
    assert(clean.count() == packed.count())
    assert(clean.count() > 0 && clean.count() < docs.count())

    // 1. quality gate: every survivor's logit (recomputed with the
    // deterministic training) is non-negative
    val w = graft.text.QualityClassifier.train(docs, "text")
    val negKept = docs.join(clean.select("doc_id"), Seq("doc_id"), "left_semi")
      .where(graft.text.QualityClassifier.logitColumn(col("text"), w) < 0.0)
      .count()
    assert(negKept == 0, s"$negKept below-threshold docs survived the gate")

    // 2. dedup: NO near-dup pair remains among the survivors
    val residualPairs = graft.text.Dedup.jaccardPairsHashed(
      graft.text.Dedup.hashedShingleDocs(
        docs.join(clean.select("doc_id"), Seq("doc_id"), "left_semi"),
        "doc_id", "text"), 0.5).count()
    assert(residualPairs == 0, s"$residualPairs near-dup pairs survived dedup")

    // 3. tokenizer artifact: merges.tsv equals training on the clean text
    val trained = graft.text.Bpe.train(clean, "text", 24)
    val merges = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$out/merges.tsv")).trim.split("\n").toSeq
      .map { l => val a = l.split("\t"); (a(1), a(2)) }
    assert(merges == trained.merges)

    // 4. packing: n_tokens matches the token array, running is the
    // doc_id-ordered prefix sum, pack_id is the windowing arithmetic
    val rows = packed.select("doc_id", "tokens", "n_tokens", "running", "pack_id")
      .as[(Long, Seq[String], Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.forall { case (_, toks, n, _, _) => toks.length.toLong == n })
    var acc = 0L
    rows.foreach { case (id, _, n, running, packId) =>
      acc += n
      assert(running == acc, s"doc $id: running $running != prefix $acc")
      assert(packId == (running - n) / 2048,
        s"doc $id: pack_id $packId off")
    }
  }

  test("pretrain --decontaminate-below: survivors share no shingle with the benchmark") {
    val out = java.nio.file.Files.createTempDirectory("pre_dec").toString
    // also exercises the --dedup strategy flag (guaranteed exact tier)
    graft.Main.main(Array("pretrain", "--data", sf0001, "--out", out,
      "--decontaminate-below", "20", "--dedup", "exact"))
    val docs = graft.Tables.documents(spark, sf0001)
    val clean = spark.read.parquet(s"$out/clean.parquet")
    assert(clean.count() > 0)
    assert(clean.where(col("doc_id") < 20).count() == 0,
      "benchmark docs must not reach the training set")
    val hashed = graft.text.Dedup.hashedShingleDocs(docs, "doc_id", "text")
    val bench = hashed.where(col("doc_id") < 20)
      .select(explode(col("hs")).as("sh")).distinct()
    val leak = hashed
      .join(clean.select("doc_id"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(col("hs")).as("sh"))
      .join(bench, Seq("sh"), "left_semi").count()
    assert(leak == 0, s"$leak leaked benchmark shingles among survivors")
  }

  test("pretrain --strip-boilerplate: clean text equals redact(strip(gated)) per survivor") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("pre_bp").toString
    graft.Main.main(Array("pretrain", "--data", sf0001, "--out", out,
      "--strip-boilerplate", "--dedup", "exact"))
    val docs = graft.Tables.documents(spark, sf0001)
    val clean = spark.read.parquet(s"$out/clean.parquet")
    assert(clean.count() > 0)
    // reconstruct the expected per-doc text independently: gate with the
    // deterministic retrained classifier, strip, redact — the pipeline
    // may DROP docs (dedup) but every survivor's text must match exactly
    val w = graft.text.QualityClassifier.train(docs, "text")
    val gated = docs.where(
      graft.text.QualityClassifier.logitColumn(col("text"), w) >= 0.0)
    val expected = graft.text.TextOps.stripBoilerplate(gated)
      .select(col("doc_id"),
        graft.text.TextOps.piiRedact(col("clean_text")).as("want"))
    val mismatches = clean.join(expected, Seq("doc_id"))
      .where(col("text") =!= col("want")).count()
    assert(mismatches == 0, s"$mismatches survivors with unstripped text")
    val unmatched = clean.join(expected, Seq("doc_id"), "left_anti").count()
    assert(unmatched == 0, "every survivor must come from the gated set")
  }
}
