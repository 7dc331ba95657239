package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface bootstrap (SURVEY §7.3: every pipeline stage also
  * expressible via `spark.sql`): registers the kernel UDFs, the native
  * codegen'd expressions, and temp views over the testdata tables so a
  * session can run the whole operator surface as plain SQL.
  */
object GraftSql {

  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    graft.relational.CoverageQueries.registerKernels(spark)
    graft.functions.GraftExtensions.register(spark)
    // plain-SQL `p BETWEEN s AND e` inner joins get the interval-stab
    // physical strategy too, not just the DataFrame helper
    graft.plans.IntervalStabJoinStrategy.register(spark)
    Tables.all.foreach { name =>
      val df =
        if (name == "events") Tables.events(spark, sfDir) // ts → epoch-µs long
        else Tables.load(spark, sfDir, name)
      df.createOrReplaceTempView(name)
    }
  }
}
