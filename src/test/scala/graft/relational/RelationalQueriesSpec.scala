package graft.relational

import graft.SparkSpec

class RelationalQueriesSpec extends SparkSpec {

  test("every declared query has matching oracle key or is rows-only") {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os.diff(qs)}")
  }

  test("all relational queries return rows at sf0.001") {
    for ((name, fn) <- RelationalQueries.queries) {
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("a1 percentages sum to ~100") {
    import org.apache.spark.sql.functions._
    val df = RelationalQueries.queries("a1_distribution_count")(spark, sf0001)
    val total = df.agg(sum("pct")).head.getDouble(0)
    assert(math.abs(total - 100.0) < 0.1)
  }

  test("t1 top-k emits exactly k rows per group") {
    val df = RelationalQueries.queries("t1_topk_per_group")(spark, sf0001)
    val counts = df.groupBy("l_returnflag").count().collect()
    assert(counts.forall(_.getLong(1) == 3L))
  }
}
