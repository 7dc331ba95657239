package graft.pipelines

import graft.SparkSpec

/** The `curate` CLI subcommand end-to-end over the real sf0.01 tables:
  * survivors equal the cur_corpus gate result (plus the semantic
  * drop when --semantic), and the stats report lands beside them.
  */
class CurateCliSpec extends SparkSpec {

  test("curate writes survivors == cur_corpus and the per-language stats") {
    val out = java.nio.file.Files.createTempDirectory("curate_out").toString
    graft.Main.main(Array(
      "curate", "--data", sf001, "--out", out))
    val survivors = spark.read.parquet(s"$out/survivors.parquet")
    val want = graft.SparkEntry.queries("cur_corpus")(spark, sf001)
    assert(survivors.count() === want.count())
    assert(survivors.columns.sorted === want.columns.sorted)
    val stats = spark.read.parquet(s"$out/lang_stats.parquet")
    assert(stats.count() === 5) // five languages
  }

  test("dedup CLI: pairs/components/canonical materialize; compacted loop == from-scratch") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("dedup_out").toString
    graft.Main.main(Array("dedup", "--data", sf001, "--out", out))
    val pairs = spark.read.parquet(s"$out/pairs.parquet")
    val comps = spark.read.parquet(s"$out/components.parquet")
    val canon = spark.read.parquet(s"$out/canonical.parquet")
    val docs = graft.Tables.documents(spark, sf001)
    val wantPairs = graft.text.Dedup.jaccardPairsHashed(
      graft.text.Dedup.hashedShingleDocs(docs, "doc_id", "text"), 0.5)
    assert(pairs.orderBy("d1", "d2").collect().toSeq ==
      wantPairs.collect().toSeq)
    // canonical = corpus minus non-min-id cluster members
    val dropped = comps.where(col("doc_id") =!= col("component")).count()
    assert(canon.count() == docs.count() - dropped)

    // the incremental daily loop lands on the SAME pair table
    val out2 = java.nio.file.Files.createTempDirectory("dedup_inc").toString
    graft.Main.main(Array("dedup", "--data", sf001, "--out", out2,
      "--new-from", "400"))
    assert(spark.read.parquet(s"$out2/pairs.parquet")
      .orderBy("d1", "d2").collect().toSeq == wantPairs.collect().toSeq)
    // pairs_old is REFRESHED to the full compacted table after every run
    // (today's pair table is tomorrow's old×old) — were it left at the
    // sub-boundary build, a later run with a larger --new-from would
    // silently miss pairs formed entirely between the two boundaries
    assert(spark.read.parquet(s"$out2/pairs_old.parquet").count() ==
      wantPairs.count())
    // exactly that later run: larger boundary, reusing the refreshed
    // old-pairs table — still equals the from-scratch pair table
    graft.Main.main(Array("dedup", "--data", sf001, "--out", out2,
      "--new-from", "450"))
    assert(spark.read.parquet(s"$out2/pairs.parquet")
      .orderBy("d1", "d2").collect().toSeq == wantPairs.collect().toSeq)
  }

  test("dedup --routed: canonical-only fast path equals the pair-table composition") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("dedup_routed").toString
    graft.Main.main(Array("dedup", "--data", sf001, "--out", out, "--routed"))
    // no pair table on the fast path — that artifact belongs to the
    // incremental loop only
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/pairs.parquet")))
    val docs = graft.Tables.documents(spark, sf001)
    val wantComps = graft.text.Dedup.connectedComponents(
      graft.text.Dedup.jaccardPairsHashed(
        graft.text.Dedup.hashedShingleDocs(docs, "doc_id", "text"), 0.5))
    assert(spark.read.parquet(s"$out/components.parquet")
      .orderBy("doc_id").collect().toSeq == wantComps.collect().toSeq)
    val canon = spark.read.parquet(s"$out/canonical.parquet")
    val dropped = wantComps.where(col("doc_id") =!= col("component")).count()
    assert(canon.count() == docs.count() - dropped)
    // --routed + --new-from must fail loud, not silently skip the pair table
    intercept[IllegalArgumentException] {
      graft.Main.main(Array("dedup", "--data", sf001, "--out", out,
        "--routed", "--new-from", "400"))
    }
  }

  test("dedup --auto: stats pick the exact tier below the crossover, artifacts match") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("dedup_auto").toString
    // sf0.01 sits far below the 20k-doc cutover with a light dup ratio, so
    // the auto decision must take the exact branch — whose signature
    // artifact is the materialized pair table (the routed fast path never
    // writes one)
    graft.Main.main(Array("dedup", "--data", sf001, "--out", out, "--auto"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/pairs.parquet")),
      "auto below the crossover must run the exact pair-table tier")
    val docs = graft.Tables.documents(spark, sf001)
    val comps = spark.read.parquet(s"$out/components.parquet")
    val dropped = comps.where(col("doc_id") =!= col("component")).count()
    assert(spark.read.parquet(s"$out/canonical.parquet").count() ==
      docs.count() - dropped)
  }

  test("curate --decontaminate-below + --redact-pii: leak-free survivors, clean text artifact") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("curate_pii").toString
    graft.Main.main(Array(
      "curate", "--data", sf001, "--out", out,
      "--decontaminate-below", "20", "--redact-pii"))
    val survivors = spark.read.parquet(s"$out/survivors.parquet")
    // survivors = cur_corpus ∩ decontamination survivors (bench docs out)
    val want = graft.SparkEntry.queries("cur_corpus")(spark, sf001)
      .join(graft.text.TextQueries.decontaminateSurvivors(spark, sf001, 20, useBloom = false)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    assert(survivors.select("doc_id").orderBy("doc_id").collect().toSeq ===
      want.select("doc_id").orderBy("doc_id").collect().toSeq)
    assert(survivors.where(col("doc_id") < 20).count() === 0)
    // the redacted artifact covers exactly the survivors, and (this corpus
    // carries no PII) round-trips the text unchanged
    val red = spark.read.parquet(s"$out/redacted.parquet")
    assert(red.count() === survivors.count())
    val joined = red.join(
      graft.Tables.documents(spark, sf001).select(col("doc_id"), col("text").as("orig")),
      Seq("doc_id"))
    assert(joined.where(col("text") =!= col("orig")).count() === 0)
  }

  test("curate --min-quality threads INTO the pipeline (gate before representatives)") {
    val out = java.nio.file.Files.createTempDirectory("curate_mq").toString
    graft.Main.main(Array(
      "curate", "--data", sf001, "--out", out, "--min-quality", "0.45"))
    val survivors = spark.read.parquet(s"$out/survivors.parquet")
    // equals the parameterized pipeline at 0.45 — NOT the 0.4-gated registry
    // result post-filtered to 0.5 (which could drop whole clusters whose
    // min-id representative fails the stricter gate)
    val want = graft.text.TextQueries.curateCorpus(spark, sf001, 0.45)
    assert(survivors.count() === want.count())
    assert(survivors.count() > 0)
    val post = graft.SparkEntry.queries("cur_corpus")(spark, sf001)
      .where(org.apache.spark.sql.functions.col("quality") >= 0.45)
    // sanity: at 0.45 the two formulations genuinely differ in what they keep
    // (min-quality of kept docs is respected either way)
    assert(survivors.agg(org.apache.spark.sql.functions.min("quality"))
      .head.getDouble(0) >= 0.45)
    assert(post.count() <= want.count())
  }

  test("curate --semantic additionally drops cosine near-dups") {
    val out = java.nio.file.Files.createTempDirectory("curate_sem").toString
    graft.Main.main(Array(
      "curate", "--data", sf001, "--out", out, "--semantic"))
    val survivors = spark.read.parquet(s"$out/survivors.parquet").count()
    val plain = graft.SparkEntry.queries("cur_corpus")(spark, sf001).count()
    assert(survivors < plain) // the near-dup drop bites
  }

  test("curate --semantic-tier: auto default equals exact below the cutover; ivf runs") {
    import org.apache.spark.sql.functions.col
    // sf0.01 keeps ~170 embeddings, far below the 10k cutover, so the
    // auto default (previous test) must equal an explicit --semantic-tier
    // exact run doc-for-doc
    val outAuto = java.nio.file.Files.createTempDirectory("curate_sem_a").toString
    graft.Main.main(Array(
      "curate", "--data", sf001, "--out", outAuto, "--semantic"))
    val outExact = java.nio.file.Files.createTempDirectory("curate_sem_e").toString
    graft.Main.main(Array(
      "curate", "--data", sf001, "--out", outExact,
      "--semantic", "--semantic-tier", "exact"))
    val a = spark.read.parquet(s"$outAuto/survivors.parquet")
      .select("doc_id").orderBy("doc_id").collect().toSeq
    val e = spark.read.parquet(s"$outExact/survivors.parquet")
      .select("doc_id").orderBy("doc_id").collect().toSeq
    assert(a === e)
    // the ivf tier runs end-to-end and can only keep MORE docs (subset
    // property of the bucketed drop)
    val outIvf = java.nio.file.Files.createTempDirectory("curate_sem_i").toString
    graft.Main.main(Array(
      "curate", "--data", sf001, "--out", outIvf,
      "--semantic", "--semantic-tier", "ivf"))
    val i = spark.read.parquet(s"$outIvf/survivors.parquet")
      .select(col("doc_id")).orderBy("doc_id").collect().toSeq
    assert(e.toSet.subsetOf(i.toSet))
  }
}
