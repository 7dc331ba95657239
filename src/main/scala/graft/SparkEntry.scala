package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-domain registries; each entry pairs a
  * DataFrame program with (where SQL-expressible) a DuckDB oracle over the
  * same parquet tables. Keys are stable operator ids tied to SURVEY.md §2.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j4_star_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.relational.RelationalQueries.queries ++
      graft.relational.CoverageQueries.queries ++
      graft.text.TextQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables.
    *
    * EVERY query carries a full hash oracle as of r14 (zero frozen pins) —
    * including the historically hard ones: `x5_blat_text` (the blat DFS
    * decomposes into budget-bounded greedy scans + a bounded anchor
    * retry, so each offset's verdict reads at most 31 chars and the sweep
    * is plain scalar SQL — CoverageQueries.x5OracleSql, the SQL
    * transcription of the NaiveBlat declarative reformulation the kernel
    * is differentially pinned against),
    * `ann_lsh_topk` (deterministic hyperplanes embedded in the SQL as
    * literals), `ann_ivf_topk` (the trained coarse-quantizer centroids
    * embedded the same way — training is deterministic and runs before the
    * oracle dump, so assignment/probe/re-rank are DuckDB-verified; see
    * TextQueries.ivfOracle), `ann_ivfpq_topk` (BOTH quantizer layers
    * embedded — coarse centroids AND per-subspace residual codebooks;
    * DuckDB re-derives codes, the ADC shortlist in the Scala probe's exact
    * fold order, and the cosine re-rank — retired from the pin list in
    * r14), `ann_hnsw_topk` (the deterministic shard GRAPHS embedded as the
    * trained artifact; DuckDB re-derives the greedy descent + ef-bounded
    * beam search itself in recursive CTEs — see TextQueries.hnswOracle,
    * retired from the pin list in r14), and `tx_quantiles_sketch` (the
    * sketch outputs embedded as literals; DuckDB independently verifies
    * membership plus the ε-rank Greenwald-Khanna bound from the raw
    * corpus — see TextQueries.quantilesSketchOracle).
    */
  def oracleSql: Map[String, String] =
    graft.relational.RelationalQueries.oracles ++
      graft.relational.CoverageQueries.oracles ++
      graft.text.TextQueries.oracles
}
