package graft

/** Dump one static oracle's SQL text to a file (or stdout) — the seam the
  * committed DuckDB differential scripts use to test the EXACT SQL the
  * gate ships, instead of a copy that could drift
  * (`tools/x5_blat_differential.py`). Only the statically-derivable
  * oracles live in [[graft.relational.CoverageQueries.oracles]]; the
  * trained-artifact oracles (hnsw/ivf/bpe) need a query run first and are
  * dumped by [[Verify]] instead.
  */
object PrintOracle {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PrintOracle <oracle-name> [out-file]")
    val sql = graft.relational.CoverageQueries.oracles.getOrElse(args(0),
      sys.error(s"no static oracle named ${args(0)}; have: " +
        graft.relational.CoverageQueries.oracles.keys.toSeq.sorted.mkString(", ")))
    if (args.length > 1) {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(args(1)).toAbsolutePath.getParent)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), sql)
    } else print(sql)
  }
}
