package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the j1 shape (not a test). */
object J1Probe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    def iv = Tables.orders(spark, d)
      .select($"o_orderkey", $"o_orderkey".as("iv_start"), ($"o_orderkey" + 9L).as("iv_end"))
    def pts = Tables.lineitem(spark, d).select($"l_orderkey", $"l_quantity")

    def fullPlanned = graft.ops.RangeJoin
      .pointInIntervalPlanned(pts, "l_orderkey", iv, "iv_start", "iv_end")
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_pts"))
      .orderBy($"o_orderkey")
    def fullBucketed = graft.ops.RangeJoin
      .pointInInterval(pts, "l_orderkey", iv, "iv_start", "iv_end", 10L)
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_pts"))
      .orderBy($"o_orderkey")

    // warmup
    fullPlanned.count(); fullBucketed.count()

    time("full_broadcast_stab") { fullPlanned.count() }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("full_shuffle_stab") { fullPlanned.count() }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    time("full_bucketed") { fullBucketed.count() }
    spark.stop()
  }
}
