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
}
