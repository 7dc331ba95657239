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

  test("curate --semantic additionally drops cosine near-dups") {
    val out = java.nio.file.Files.createTempDirectory("curate_sem").toString
    graft.Main.main(Array(
      "curate", "--data", sf001, "--out", out, "--semantic"))
    val survivors = spark.read.parquet(s"$out/survivors.parquet").count()
    val plain = graft.SparkEntry.queries("cur_corpus")(spark, sf001).count()
    assert(survivors < plain) // the near-dup drop bites
  }
}
