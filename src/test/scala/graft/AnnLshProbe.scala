package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-measurement of ann_lsh_topk's stage breakdown (r8 verdict
  * ask #5). Not part of the engine surface.
  */
object AnnLshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        if (r < 0) println("impossible")
        t
      }
      println(f"TIME $label best ${secs.min}%.3f s")
    }
    spark.range(1000000).selectExpr("sum(id)").collect()

    val emb = Tables.embeddings(spark, sfDir)
    println("n emb = " + emb.count())

    import graft.ann.Ann
    time("full_lsh_topk") {
      Ann.lshTopK(emb, "vec_id", "embedding", col("vec_id") < 20, k = 5, dim = 64).count()
    }
    // candidate stage only (explode + equi-join + dedup, IDs only)
    val sigs = array((0 until 8).map { t =>
      struct(lit(t).as("t"),
        Ann.hyperplaneSignature(col("embedding"), 64, 8, t * 8).as("sig"))
    }: _*)
    time("candidates_only") {
      emb.where(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), explode(sigs).as("cell"))
        .join(emb.select(col("vec_id").as("neighbor_id"), explode(sigs).as("cell")), Seq("cell"))
        .where(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates("query_id", "neighbor_id")
        .count()
    }
    // signature UDF cost alone over the corpus
    time("signature_only") {
      emb.select(col("vec_id"), explode(sigs).as("cell")).count()
    }
    // broadcast-probe variant: the query side (20 ids × 8 cells) broadcasts,
    // so candidate generation is map-side over the corpus; scoring joins
    // also broadcast the query vectors; only the dedup + window shuffle.
    time("broadcast_probe_full") {
      import org.apache.spark.sql.expressions.Window
      val qcells = broadcast(emb.where(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), explode(sigs).as("cell")))
      val candidates = qcells
        .join(emb.select(col("vec_id").as("neighbor_id"), explode(sigs).as("cell")), Seq("cell"))
        .where(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates("query_id", "neighbor_id")
      val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
      val base = emb.select(col("vec_id").cast("long").as("id"),
        transform(col("embedding"), f => f.cast("double")).as("v"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      candidates
        .join(broadcast(base.select(col("id").as("query_id"), col("v").as("qvec"), col("nrm").as("qn")
          ).where(col("query_id") < 20)), Seq("query_id"))
        .join(base.select(col("id").as("neighbor_id"), col("v").as("nvec"), col("nrm").as("nn")),
          Seq("neighbor_id"))
        .withColumn("cos", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .count()
    }
    spark.stop()
  }
}
