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
    assert(TextQueries.embeddingsFingerprint(dir).exists(_.startsWith("absent:")))
  }

  test("non-local schemes are unfingerprintable (None), never a constant") {
    // r15 ADVICE: hdfs:// resolved to a nonexistent LOCAL path, so every
    // remote state hashed to the same 'absent:' constant and the memo
    // silently replayed stale dumps. Now: None -> caller skips the memo.
    assert(TextQueries.embeddingsFingerprint("hdfs://nn:8020/warehouse/sf1").isEmpty)
    assert(TextQueries.embeddingsFingerprint("s3a://bucket/prefix").isEmpty)
    // r16 ADVICE: Hadoop Path.toString emits SINGLE-slash URIs; the old
    // '://' regex classified these as local and hashed remote state to the
    // 'absent:' constant again
    assert(TextQueries.embeddingsFingerprint("hdfs:/nn/warehouse/sf1").isEmpty)
    assert(TextQueries.embeddingsFingerprint("s3a:/bucket/prefix").isEmpty)
    // opaque file:rel has no resolvable path -> no memo rather than a guess
    assert(TextQueries.embeddingsFingerprint("file:relative/x").isEmpty)
    // file: IS local — strip the scheme and fingerprint the path
    val dir = java.nio.file.Files.createTempDirectory("hnsw_memo_file").toString
    writeEmbeddings(dir, seed = 7)
    val viaUri = TextQueries.embeddingsFingerprint(s"file://$dir")
    assert(viaUri.isDefined && viaUri == TextQueries.embeddingsFingerprint(dir))
    // the single-slash form Hadoop Path.toString actually emits (r16 ADVICE)
    assert(TextQueries.embeddingsFingerprint(s"file:$dir") == viaUri)
  }

  test("in-place rewrite with identical sizes and mtimes still changes the print") {
    // the r15 verdict's residual-alias note: same file name, same length,
    // same mtime, different bytes — the tail CRC must discriminate.
    val dir = java.nio.file.Files.createTempDirectory("hnsw_memo_alias").toString
    val root = java.nio.file.Paths.get(dir, "embeddings.parquet")
    java.nio.file.Files.createDirectories(root)
    val f = root.resolve("part-00000")
    val t = java.nio.file.attribute.FileTime.fromMillis(1700000000000L)
    java.nio.file.Files.write(f, Array.fill[Byte](128)(1))
    java.nio.file.Files.setLastModifiedTime(f, t)
    val fp1 = TextQueries.embeddingsFingerprint(dir)
    java.nio.file.Files.write(f, Array.fill[Byte](128)(2))
    java.nio.file.Files.setLastModifiedTime(f, t)
    val fp2 = TextQueries.embeddingsFingerprint(dir)
    assert(fp1.isDefined && fp2.isDefined && fp1 != fp2,
      "tail CRC must break the size+mtime alias")
  }
}
