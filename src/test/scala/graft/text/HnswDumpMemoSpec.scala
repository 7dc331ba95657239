package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r15 ADVICE hardening: the HNSW oracle-dump memo must key on a
  * CONTENT fingerprint of the embeddings data, not on the dir string —
  * rewriting a dir's parquet mid-session must rebuild the dump (else the
  * gate searches fresh graphs while the oracle replays a stale dump).
  */
class HnswDumpMemoSpec extends SparkSpec {
  import spark.implicits._

  private def writeEmbeddings(dir: String, seed: Int, n: Int = 48): Unit = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()))
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("rewriting the data under a dir refreshes the memoized dump") {
    val dir = java.nio.file.Files.createTempDirectory("hnsw_memo").toString
    TextQueries.clearHnswDumps()

    writeEmbeddings(dir, seed = 1)
    val emb1 = graft.Tables.embeddings(spark, dir)
    val fp1 = TextQueries.embeddingsFingerprint(dir)
    val dump1 = TextQueries.hnswDumpFor(spark, dir, emb1)

    // same data, same fingerprint -> cache hit (identical array instance)
    assert(TextQueries.embeddingsFingerprint(dir) == fp1)
    assert(TextQueries.hnswDumpFor(spark, dir, emb1) eq dump1)

    // overwrite with DIFFERENT vectors: fingerprint changes (parquet
    // overwrite writes new part files), dump rebuilds, graphs differ
    writeEmbeddings(dir, seed = 2)
    val fp2 = TextQueries.embeddingsFingerprint(dir)
    assert(fp2 != fp1, "content fingerprint must change on rewrite")
    val emb2 = graft.Tables.embeddings(spark, dir)
    val dump2 = TextQueries.hnswDumpFor(spark, dir, emb2)
    assert(!(dump2 eq dump1), "stale dump must not be replayed")
    // the rebuilt dump reflects the NEW data, not the old: adjacency for
    // random gaussian corpora with different seeds cannot coincide
    val adj1 = dump1.flatMap(_.adjacency.flatMap(_._3)).toSeq
    val adj2 = dump2.flatMap(_.adjacency.flatMap(_._3)).toSeq
    assert(adj1 != adj2, "rebuilt dump must reflect the rewritten data")

    // superseded print evicted: a third call with unchanged data hits
    writeEmbeddings(dir, seed = 2)
    // (same seed but a fresh overwrite -> new mtimes -> new fingerprint;
    // proves eviction keeps exactly one live entry per dir)
    val dump3 = TextQueries.hnswDumpFor(spark, dir,
      graft.Tables.embeddings(spark, dir))
    assert(dump3.map(_.entryId).toSeq == dump2.map(_.entryId).toSeq,
      "same data must rebuild to the same deterministic graphs")
    TextQueries.clearHnswDumps()
  }

  test("fingerprint handles an absent embeddings table") {
    val dir = java.nio.file.Files.createTempDirectory("hnsw_memo_absent").toString
    assert(TextQueries.embeddingsFingerprint(dir).startsWith("absent:"))
  }
}
