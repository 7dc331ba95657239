package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see /root/repo/TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the loader is
  * the single seam where that swap happens — every query goes through here, so
  * replacing `spark.read.parquet` with `spark.table` (bucketed, partition-pruned)
  * requires no query changes.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped with two physical layouts across driver testdata
    * generations: parquet TIMESTAMP(NANOS) (which vanilla Spark rejects with
    * [PARQUET_TYPE_ILLEGAL] — the legacy flag reads it as a raw nanos long)
    * and plain timestamp[us] (read as TIMESTAMP_NTZ). Normalize both to an
    * epoch-MICROSECOND BIGINT at this seam: µs is the precision the DuckDB
    * oracle shares (`epoch_us(ts)`), and every downstream consumer — window
    * ids, sessionization gaps, as-of ordering — computes on the long, so the
    * two engines agree bit-for-bit whichever layout the writer produced.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }

  /** `ts` → epoch-µs long, whatever the physical type (see [[events]]).
    * Naive timestamps are interpreted as UTC — every entry point (Verify,
    * Bench, Main, the test base) pins `spark.sql.session.timeZone=UTC`, so
    * the NTZ→TIMESTAMP cast is the identity on the stored µs value.
    * Works on streaming DataFrames too (pure column transform).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", org.apache.spark.sql.functions.expr("ts div 1000"))
      case _        => df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Materialize one of the raw parquet tables as a bucketed + sorted
    * catalog table — the 100 TB swap this loader's scaladoc promises.
    * Queries that join or aggregate on `bucketCol` then read the bucket
    * layout straight off disk: Catalyst treats the scan as already
    * hash-partitioned (and sorted within buckets), so the sort-merge
    * join's Exchange — the dominant cost of a big-×-big join — and the
    * aggregation's re-shuffle both disappear from the plan.
    * BucketedTablesSpec asserts exactly that (0 shuffles vs 2+ on the
    * identical unbucketed join). On a real cluster this runs once at
    * ingest; `numBuckets` is sized so a bucket (table size / buckets)
    * fits an executor core's scan budget.
    */
  def materializeBucketed(
      spark: SparkSession,
      dir: String,
      name: String,
      bucketCol: String,
      numBuckets: Int,
      tableName: String,
      path: String): Unit =
    load(spark, dir, name).write
      .format("parquet")
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)
}
