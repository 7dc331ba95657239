package graft

import graft.bio.{InterRecord, IntervalLocation}

/** SQL surface bootstrap + the distributed locate operator. */
class GraftSqlSpec extends SparkSpec {

  test("registerAll exposes tables, kernel UDFs, and the native expression to SQL") {
    GraftSql.registerAll(spark, sf0001)
    val n = spark.sql("SELECT count(*) FROM lineitem").head.getLong(0)
    assert(n > 0)
    val row = spark.sql(
      """SELECT direct_similarity('acgt', 'acgg') AS udf_score,
                direct_similarity_native('acgt', 'acgg') AS native_score,
                consistency_similarity('aaaa', 'aata', 1) AS cons,
                revcomp('acgt') AS rc,
                sorted_long_intersect_count(array(1L,3L,5L), array(3L,5L,7L)) AS inter,
                double_array_dot_native(array(1.0D,2.0D), array(3.0D,4.0D)) AS dot""").head
    assert(row.getDouble(0) === 3.0)
    assert(row.getDouble(1) === 3.0)
    assert(row.getDouble(2) === 3.0)
    assert(row.getString(3) === "acgt")
    assert(row.getLong(4) === 2L)
    assert(row.getDouble(5) === 11.0)
    // the r11 signature kernels are first-class SQL functions too
    val sig = spark.sql(
      """SELECT shingle_strings_native('a b c d', 3) AS sh,
                size(hashed_shingles_native('a b c d', 3)) AS nh,
                size(minhash_signature_native(array('a b c'), 4)) AS nm,
                simhash_native('a b c') AS sim,
                hyperplane_signature_native(
                  array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 2, 4, 0) AS hp""").head
    assert(sig.getSeq[String](0) === Seq("a b c", "b c d"))
    assert(sig.getInt(1) === 2)
    assert(sig.getInt(2) === 4)
    assert(sig.getLong(3) !== 0L)
    assert(sig.getLong(4) >= 0L && sig.getLong(4) < 16L)
    // events view readable (ts normalized to epoch-µs at the loader seam)
    assert(spark.sql("SELECT count(*) FROM events").head.getLong(0) > 0)
  }

  test("plain-SQL BETWEEN join plans as the interval-stab strategy") {
    GraftSql.registerAll(spark, sf0001)
    val df = spark.sql(
      """SELECT o_orderkey, l_orderkey FROM lineitem JOIN orders
         ON l_orderkey BETWEEN o_orderkey AND o_orderkey + 9""")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalStabJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(df.count() > 0)
  }

  test("locateHits distributes the J1 probe over a hits DataFrame") {
    import spark.implicits._
    val anns = Seq(
      InterRecord("g1", "p1", 100, 300, isGene = true),
      InterRecord("g2", "p2", 500, 700, isGene = true))
    val hits = Seq((150, 180), (400, 450), (650, 800)).toDF("start", "end")
    val got = IntervalLocation.locateHits(spark, hits, anns).collect()
      .map { case (s, _, h) => (s, h.kind, h.name) }.toSet
    assert(got === Set(
      (150, "cds", "g1"),
      (400, "inter-genic", "g1, g2"),
      (650, "3'", "g2")))
  }
}
