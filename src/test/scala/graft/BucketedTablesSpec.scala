package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** The bucketed-table materialization demo: the `Tables` loader seam
  * actually swapped for a bucketed catalog table, with the plan-level
  * payoff asserted — the lineitem⋈orders sort-merge join and the
  * follow-on aggregation run with ZERO shuffle exchanges when both
  * sides are bucketed on the join key, versus 2+ on the identical
  * unbucketed query. This is the ingest-time shape a 100 TB deployment
  * uses for every hot join key.
  */
class BucketedTablesSpec extends SparkSpec {

  private def shuffles(df: DataFrame): Int =
    df.queryExecution.executedPlan
      .collectWithSubqueries { case e: ShuffleExchangeLike => e }.size

  test("bucketed lineitem/orders join+agg plans drop every Exchange") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val bcast = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    // plan-shape assertions need the static planner (AQE re-plans at
    // runtime) and a real SMJ (broadcast would hide the shuffle anyway)
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.materializeBucketed(spark, sf0001, "lineitem", "l_orderkey", 4,
        "lineitem_bkt", s"$dir/lineitem_bkt")
      Tables.materializeBucketed(spark, sf0001, "orders", "o_orderkey", 4,
        "orders_bkt", s"$dir/orders_bkt")

      def query(li: DataFrame, ord: DataFrame): DataFrame =
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .groupBy($"l_orderkey")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").as("qty"))

      val plain = query(Tables.lineitem(spark, sf0001), Tables.orders(spark, sf0001))
      val bucketed = query(spark.table("lineitem_bkt"), spark.table("orders_bkt"))

      assert(shuffles(plain) >= 2,
        "unbucketed SMJ must shuffle both sides — baseline sanity")
      assert(shuffles(bucketed) === 0,
        "bucketed scan must satisfy the join AND the aggregation distribution")
      // and the layout change must not change the answer
      val a = plain.orderBy("l_orderkey").collect()
      val b = bucketed.orderBy("l_orderkey").collect()
      assert(a.sameElements(b))
    } finally {
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }
}
