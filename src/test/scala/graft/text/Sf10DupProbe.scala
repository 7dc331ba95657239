package graft.text

/** Dev-only probe: the dup-heavy 10× bracket (r15 verdict ask #3) — the
  * auto-router's decision and the exact/routed arms on a corpus where
  * dedup actually has work (dup_ratio ~0.8), plus the 10× ANN point.
  * Bench-envelope measurement shape.
  */
object Sf10DupProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.scheduler.listenerbus.eventqueue.capacity", "200000")
      .appName("sf10dup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF10DUP_DIR", "/tmp/sf10dup")
    @volatile var spill = 0L
    @volatile var peak = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spill += m.memoryBytesSpilled + m.diskBytesSpilled
          peak = math.max(peak, m.peakExecutionMemory)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    val t0r = System.nanoTime()
    val rs = Dedup.routeStats(graft.Tables.documents(spark, d), "text")
    println(f"ROUTE n_docs=${rs.nDocs} dup_ratio=${rs.dupRatio}%.4f " +
      f"use_routed=${rs.useRouted()} sec=${(System.nanoTime() - t0r) / 1e9}%.2f")
    // exact_sample: the exact all-pairs arm on a DOCUMENTED deterministic
    // 10% sample (doc_id % 10 == 0 — 40 per planted class + 10k uniques).
    // The full exact arm OOMs an 8 GB heap at this bracket (~80M
    // candidate pairs from the planted classes alone), which is the
    // router's reason to exist; the sample records the arm's cost shape
    // without pretending production would run it. SAMPLING BIAS, stated
    // (r17 ADVICE sweep): the generator lays classes out as CONSECUTIVE
    // id blocks of 400, so doc_id%10 keeps exactly 40 members of EVERY
    // class — class count survives intact while per-class quadratic pair
    // work shrinks 100× (pairs need both ends ≡0 mod 10). The sample
    // therefore measures the arm's cost SHAPE (Σc² over uniformly
    // shrunken classes), not a 10% cost: scale its pair volume by ~100,
    // not 10, to estimate the full arm — which is how the OOM
    // adjudication reads it. A generator change to interleaved class
    // ids would keep this property (mod and block structure commute
    // here only because every class has 400 ≡ 0 mod 10 members).
    // hnsw_prod: the
    // distributed production search (shard graphs in tasks), NOT the gate
    // query, whose driver-side oracle dump is capped at 100k rows by
    // design.
    def custom(name: String): Option[org.apache.spark.sql.DataFrame] =
      name match {
        case "dd_canonical_exact_sample" =>
          val docs = graft.Tables.documents(spark, d)
            .where(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
          val comps = Dedup.connectedComponents(
            Dedup.pairTable(docs, "doc_id", "text", 0.5))
          import org.apache.spark.sql.functions._
          Some(docs.join(broadcast(
              comps.where(col("doc_id") =!= col("component"))
                .select(col("doc_id"))), Seq("doc_id"), "left_anti")
            .select(col("doc_id"), length(col("text")).as("text_len"))
            .orderBy("doc_id"))
        case "ann_hnsw_prod" =>
          import org.apache.spark.sql.functions._
          Some(graft.ann.Ann.hnswTopK(graft.Tables.embeddings(spark, d),
            "vec_id", "embedding", col("vec_id") < 20, k = 5,
            numShards = 32))
        // the corpus-adaptive shard arm (r17, sf100): HNSW insert cost
        // grows with GRAPH size, so fixed shards make the build
        // superlinear in corpus — more shards keep per-shard graphs
        // small (build ~linear, recall UP per the r16 shard finding) at
        // the price of per-query fan-out across every shard, the trade
        // that caps how far this lever stretches (a 20B-vector corpus
        // needs a shard-routing layer, not more brute fan-out).
        case "ann_hnsw_prod128" =>
          import org.apache.spark.sql.functions._
          Some(graft.ann.Ann.hnswTopK(graft.Tables.embeddings(spark, d),
            "vec_id", "embedding", col("vec_id") < 20, k = 5,
            numShards = 128))
        case _ => None
      }
    val names = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("dd_canonical_auto", "dd_canonical_routed",
        "dd_canonical_exact_sample", "ann_hnsw_prod", "ir_batch_bm25"))
    // recall@5 of the shard-count lever at the 200k bracket: the r16
    // envelope raised ann_hnsw_prod from the gate's 8 shards to one per
    // core (32) for build parallelism, claiming recall is unharmed
    // (candidates are the union of per-shard top-k over smaller graphs,
    // exact-reranked). Measure it instead of asserting it.
    if (sys.env.get("SPARK_GRAFT_PROBE_ONLY").forall(_.contains("recall"))) {
      import org.apache.spark.sql.functions._
      val emb = graft.Tables.embeddings(spark, d)
      def top5(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
        df.select("query_id", "neighbor_id").collect()
          .groupBy(_.getLong(0)).map { case (q, rs) =>
            q -> rs.map(_.getLong(1)).toSet }
      val truth = top5(graft.ann.Ann.cosineTopK(
        emb, "vec_id", "embedding", col("vec_id") < 20, k = 5))
      for (shards <- Seq(8, 32)) {
        val got = top5(graft.ann.Ann.hnswTopK(emb, "vec_id", "embedding",
          col("vec_id") < 20, k = 5, numShards = shards))
        val recall = truth.map { case (q, t) =>
          got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
        }.sum / truth.size
        println(f"RECALL hnsw shards=$shards recall_at_5=$recall%.3f queries=${truth.size}")
      }
    }
    for (name <- names if name != "recall"; run <- 1 to 2) {
      spill = 0L; peak = 0L
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      custom(name).getOrElse(graft.SparkEntry.queries(name)(spark, d))
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val gc = (gcMillis() - gc0) / 1e3
      Thread.sleep(500)
      println(f"RESULT $name run=$run sec=$sec%.2f gc_sec=$gc%.2f " +
        f"spill_mb=${spill / 1048576} peak_mb=${peak / 1048576}")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
