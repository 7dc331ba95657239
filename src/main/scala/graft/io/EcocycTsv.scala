package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.bio.InterRecord

/** D4 — one EcoCyc gene row (reference `EcocycRecord`,
  * `src/utils/ecocyc_data_loader.py:53-64`): positional columns coerce to
  * int with the reference's `-1` sentinel for missing/blank.
  */
final case class EcocycRecord(
    gene: String,
    productType: String,
    product: String,
    promoterName: String,
    promoterPos: Int,
    geneStartPos: Int,
    mapStartPos: Int,
    mapEndPos: Int,
    exonicGeneSizes: String,
    recordType: String)

/** S3/G2 — dynamic-header TSV scan + 1→1..2 interval-record generation
  * (reference `EcocycDataLoader.build_database`,
  * `ecocyc_data_loader.py:11-34`; generator `:66-83`).
  *
  * The header row is discovered at runtime (D7): Spark's CSV reader with
  * `header=true` handles exactly that; missing columns surface as nulls and
  * coerce to the `-1` sentinel to preserve downstream comparisons.
  */
object EcocycTsv {

  def read(spark: SparkSession, path: String): Dataset[EcocycRecord] = {
    import spark.implicits._
    val raw = spark.read
      .option("header", "true").option("sep", "\t")
      .csv(path)
    typedFrom(raw)
  }

  /** Normalize a dynamic-header DataFrame into the fixed record schema. */
  def typedFrom(raw: DataFrame): Dataset[EcocycRecord] = {
    import raw.sparkSession.implicits._
    def strCol(name: String) =
      if (raw.columns.contains(name)) coalesce(col(name), lit("")) else lit("")
    def posCol(name: String) =
      if (raw.columns.contains(name))
        coalesce(when(col(name) === "", lit(-1)).otherwise(col(name)).cast("int"), lit(-1))
      else lit(-1)
    raw.select(
      strCol("gene").as("gene"),
      strCol("product_type").as("productType"),
      strCol("product").as("product"),
      strCol("promoter_name").as("promoterName"),
      posCol("promoter_pos").as("promoterPos"),
      posCol("gene_start_pos").as("geneStartPos"),
      posCol("map_start_pos").as("mapStartPos"),
      posCol("map_end_pos").as("mapEndPos"),
      strCol("exonic_gene_sizes").as("exonicGeneSizes"),
      strCol("type").as("recordType")
    ).as[EcocycRecord]
  }

  /** G2 generator: every gene row yields its gene interval; rows with a
    * promoter also yield the promoter interval when `outputPromoter`
    * (reference `generate_inter_record`, `ecocyc_data_loader.py:66-83`).
    */
  def interRecords(r: EcocycRecord, outputPromoter: Boolean): Seq[InterRecord] = {
    val gene = InterRecord(r.gene, r.product, r.mapStartPos, r.mapEndPos, isGene = true)
    if (r.promoterName.nonEmpty && outputPromoter)
      Seq(gene, InterRecord(r.promoterName, "", r.promoterPos, r.geneStartPos, isGene = false))
    else Seq(gene)
  }

  /** The sorted broadcast-ready annotation index (J1's build side). */
  def loadInterRecords(
      spark: SparkSession,
      path: String,
      outputPromoter: Boolean = false): Array[InterRecord] =
    read(spark, path).collect()
      .flatMap(interRecords(_, outputPromoter))
      .sortBy(_.start)
}
