package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** r19 optimization tooling (guide §1/§7.2): dump `explain("formatted")`
  * for every registered gate query so plan shapes (Exchange count, join
  * strategy, PushedFilters/ReadSchema, codegen spans) can be diffed
  * before/after a change without re-running the bench.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [q1,q2,...]
  *
  * Not part of the driver contract — a measurement aid only; it executes
  * nothing beyond what query CONSTRUCTION already executes (some queries
  * train artifacts / run stats passes while building their DataFrame).
  *
  * SPARK_GRAFT_PLAN_EXEC=1 additionally EXECUTES each query (noop-style
  * toRdd pass) and appends the post-execution adaptive plan, where
  * ReusedExchange / AQEShuffleRead nodes and the final join strategies
  * are visible (explain() before execution only shows the initial plan).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val exec = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          var txt = df.queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          if (exec) {
            df.queryExecution.toRdd.foreach(_ => ())
            txt += "\n\n== Post-execution adaptive plan ==\n" +
              df.queryExecution.executedPlan.toString
          }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$name.txt"), txt)
          println(s"[plandump] $name ok")
        } catch {
          case e: Throwable =>
            println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
