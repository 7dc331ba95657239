package graft.bio

import graft.SparkSpec
import scala.io.Source

/** Cluster-match vs goldens produced by EXECUTING the reference
  * ClusterMatcher on `test_cluster.fna` (4 blocks: two equal targets, one
  * with an invalid 'N' base, one with a bad marker that the reference
  * drops). All four output files must match byte-for-byte.
  */
class ClusterMatchSpec extends SparkSpec {

  private def res(name: String): String = Source.fromResource(name).mkString

  private lazy val blocks = ClusterMatch.parse(res("test_cluster.fna"), "rnaX")
  private lazy val clusters = ClusterMatch.cluster(blocks)

  test("parse drops bad-marker blocks and keeps track structure") {
    assert(blocks.map(_.geneNo) === Seq("101", "102", "103"))
    val b = blocks.head
    assert(b.tracks.map(_.name) === Seq("rnaX", "tgtA", "resA"))
    assert(b.tracks(1).seq === "ACGU")
    assert((b.tracks(2).start, b.tracks(2).end) === ((200, 203)))
  }

  test("cluster_result matches reference byte-for-byte") {
    assert(ClusterMatch.renderClusterResult(clusters) ===
      res("cluster_goldens/rnaX_cluster_result.txt"))
  }

  test("sample_result matches reference byte-for-byte") {
    assert(ClusterMatch.renderSampleResult(clusters) ===
      res("cluster_goldens/rnaX_sample_result.txt"))
  }

  test("all_result and only_result match reference byte-for-byte") {
    val (all, only, invalid) = ClusterMatch.renderMemberResults(clusters)
    assert(all === res("cluster_goldens/rnaX_all_result.txt"))
    assert(only === res("cluster_goldens/rnaX_only_result.txt"))
    assert(invalid === Set('N'))
  }

  test("distributed clusterDF groups identically to the sequential form") {
    val df = ClusterMatch.clusterDF(spark, blocks).collect()
    val want = clusters.map { case (rep, ms) =>
      (rep.index, ms.length.toLong, ms.map(_.geneNo).mkString(","))
    }
    val got = df.map(r => (r.getInt(1), r.getLong(2), r.getString(3))).toSeq
    assert(got === want)
  }

  test("multi-line sequence continuation stitches") {
    val text =
      """>>hdr
        |x
        |y
        |(7) ? ok
        |rnaX 1 acg 3
        |tgt 10 ACG 12
        |res 20 aaa 22
        |""".stripMargin
    val b = ClusterMatch.parse(text, "rnaX")
    assert(b.head.tracks(1).seq === "ACG")
  }
}
