package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The `tokenize` / `classify` / `search` CLI subcommands end-to-end over
  * real tables: artifacts land, round-trip, and agree with the library
  * calls they wrap.
  */
class TokenizeCliSpec extends SparkSpec {
  import spark.implicits._

  test("tokenize: merges.tsv round-trips and encoded.parquet matches the library path") {
    val out = java.nio.file.Files.createTempDirectory("tok_out").toString
    graft.Main.main(Array("tokenize", "--data", sf0001, "--out", out))
    // the deployable artifact parses back into the exact merge list
    val lines = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/merges.tsv")).trim.split("\n").toSeq
    val merges = lines.map { l =>
      val Array(rank, lft, rgt) = l.split("\t")
      (rank.toInt, (lft, rgt))
    }
    assert(merges.map(_._1) == merges.indices.toSeq, "ranks must be dense")
    val docs = graft.Tables.documents(spark, sf0001)
    val trained = graft.text.Bpe.train(docs, "text", 24)
    assert(merges.map(_._2) == trained.merges)
    // the encoded table equals a fresh library encode with those merges
    val got = spark.read.parquet(s"$out/encoded.parquet")
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().sortBy(_._1)
    val want = docs.select(col("doc_id"),
        graft.text.Bpe.encodeTokens(col("text"), trained.merges).as("t"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("tokenize --merges-in: the frozen artifact round-trips through deployment") {
    // train on one run, deploy the artifact to a second run: identical
    // encoding without retraining — and a corrupted artifact fails loud
    val out1 = java.nio.file.Files.createTempDirectory("tok_train").toString
    graft.Main.main(Array("tokenize", "--data", sf0001, "--out", out1))
    val out2 = java.nio.file.Files.createTempDirectory("tok_deploy").toString
    graft.Main.main(Array("tokenize", "--data", sf0001, "--out", out2,
      "--merges-in", s"$out1/merges.tsv"))
    val a = spark.read.parquet(s"$out1/encoded.parquet")
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().sortBy(_._1)
    val b = spark.read.parquet(s"$out2/encoded.parquet")
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    // rank-gapped artifact → loud failure, not a silent re-tokenization
    val bad = java.nio.file.Files.createTempFile("merges_bad", ".tsv")
    java.nio.file.Files.writeString(bad, "0\ta\tb\n2\tc\td\n")
    intercept[IllegalArgumentException] {
      graft.text.Bpe.loadMerges(bad.toString)
    }
  }

  test("classify: weights.tsv matches training; kept.parquet is the logit gate") {
    val out = java.nio.file.Files.createTempDirectory("cls_out").toString
    graft.Main.main(Array("classify", "--data", sf0001, "--out", out,
      "--min-logit", "0"))
    val docs = graft.Tables.documents(spark, sf0001)
    val w = graft.text.QualityClassifier.train(docs, "text")
    val wBack = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/weights.tsv")).trim.split("\n")
      .map(_.split("\t")(1).toDouble)
    assert(wBack.toSeq == w.toSeq, "weights.tsv must round-trip bit-exactly")
    val scored = spark.read.parquet(s"$out/scored.parquet")
    val kept = spark.read.parquet(s"$out/kept.parquet")
    assert(kept.count() == scored.where(col("logit") >= 0.0).count())
    assert(kept.count() > 0 && kept.count() < docs.count())
  }

  test("search: CLI hits equal the library searchTopK") {
    val docs = graft.Tables.documents(spark, sf0001)
    val want = graft.text.Retrieval.searchTopK(
        docs, "doc_id", "text", Seq("dup", "stream"), 5)
      .as[(Long, Long)].collect().toSeq
    assert(want.length == 5)
    // scores strictly ordered desc (ties would break by id — either way
    // monotone non-increasing)
    assert(want.map(_._2) == want.map(_._2).sortBy(-_))
    graft.Main.main(Array("search", "--data", sf0001,
      "--terms", "dup,stream", "--k", "5"))
  }
}
