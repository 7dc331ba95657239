package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: quantify count()-pruning vs full computation (noop write)
  * per gate — the r12 bench-methodology check. count() lets Catalyst
  * prune deterministic projections, so projection-only gates time a plan
  * that never runs their kernels; the DuckDB twin fetchall()s full rows.
  */
object CountVsNoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = sys.env.get("PROBE_ONLY").map(_.split(",").toSeq).getOrElse(Seq(
      "tx_bpe_encode", "tx_token_count", "dd_simhash", "x1_direct_text",
      "x2_edit_text", "tx_lang_id", "mm_image_decode", "tx_fingerprint",
      "dd_ngram_jaccard", "j4_star_revenue"))
    println(f"${"query"}%-18s ${"count"}%8s ${"noop"}%8s ${"ratio"}%6s")
    names.foreach { n =>
      def best(f: => Unit): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc(); t
      }.min
      val c = best(SparkEntry.queries(n)(spark, sfDir).count())
      val w = best(SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
      println(f"$n%-18s $c%8.3f $w%8.3f ${w / c}%6.2f")
    }
    spark.stop()
  }
}
