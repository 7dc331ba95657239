package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native merge-intersection count vs a reference Scala implementation:
  * identical counts on random sorted-set inputs (including empty and
  * disjoint arrays), null propagation, and the plan stays inside
  * whole-stage codegen (no ScalaUDF node).
  */
class SortedLongIntersectCountSpec extends SparkSpec {

  private def refCount(a: Seq[Long], b: Seq[Long]): Long =
    a.toSet.intersect(b.toSet).size.toLong

  test("expression equals set intersection on 300 random sorted-set pairs") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(31)
    def sortedSet(max: Int): Seq[Long] =
      Seq.fill(rnd.nextInt(max))(rnd.nextInt(40).toLong).distinct.sorted
    val rows = Seq.tabulate(300) { i =>
      // small value domain forces frequent overlap; include empties
      (i, sortedSet(60), sortedSet(60))
    }
    val df = rows.toDF("id", "a", "b")
    df.createOrReplaceTempView("slic_test")
    val got = spark.sql(
      "SELECT id, sorted_long_intersect_count(a, b) AS c FROM slic_test ORDER BY id")
      .as[(Int, Long)].collect()
    val want = rows.map { case (i, a, b) => (i, refCount(a, b)) }
    assert(got.toSeq === want)
  }

  test("codegen path: no ScalaUDF node; null propagates") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
    df.createOrReplaceTempView("slic_plan")
    val plan = spark.sql("SELECT sorted_long_intersect_count(a, b) FROM slic_plan")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    assert(plan.toLowerCase.contains("sorted_long_intersect_count") ||
      plan.toLowerCase.contains("sortedlongintersect"))
    val v = spark.sql("SELECT sorted_long_intersect_count(a, b) FROM slic_plan")
      .collect().head.getLong(0)
    assert(v === 2L)
    val n = spark.sql(
      "SELECT sorted_long_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L))")
      .collect().head
    assert(n.isNullAt(0))
  }
}
