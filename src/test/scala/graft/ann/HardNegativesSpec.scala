package graft.ann

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** Pins [[Ann.hardNegatives]]'s band semantics: the raw-cosine band
  * [lo, hi) binds BEFORE ranking (a planted exact duplicate — the
  * hardest "negative" and a guaranteed false one — is excluded by the
  * upper edge), self is excluded, ranks are contiguous hardest-first.
  */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  test("planted duplicate is excluded by the upper band edge; band binds on raw cosine") {
    // query 0; id 50 is an exact duplicate (cos 1.0); id 1..N random-ish
    val dim = 16
    val rows = (0L until 60L).map { i =>
      if (i == 50L) (i, Array.tabulate(dim)(j => math.sin(0 * 7.0 + j)))
      else (i, Array.tabulate(dim)(j => math.sin(i * 7.0 + j)))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Ann.hardNegatives(emb, "vec_id", "embedding",
        col("vec_id") === 0, k = 10, lo = 0.1, hi = 0.9)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    assert(!out.exists(_._3 == 50L), "the exact duplicate must not be mined as a negative")
    assert(!out.exists(_._3 == 0L), "self excluded")
    assert(out.map(_._2) == (1 to out.size), "contiguous ranks")
    assert(out.sortBy(_._2).map(_._4) == out.map(_._4).sortBy(-_), "hardest first")
    // recompute raw cosines: every mined neighbor sits inside [lo, hi)
    val byId = rows.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    out.foreach { case (q, _, n, _) =>
      val c = cos(byId(q), byId(n))
      assert(c >= 0.1 && c < 0.9, s"neighbor $n raw cosine $c outside band")
    }
  }

  test("gate rows equal a clean-room banded recompute (sf0.01)") {
    val emb = Tables.embeddings(spark, sf001)
    val hard = graft.SparkEntry.queries("ann_hard_negatives")(spark, sf001)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(hard.map(_._1).distinct.size == 20)
    val rows = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    val expect = rows.filter(_._1 < 20).sortBy(_._1).flatMap { case (q, qv) =>
      val qn = math.sqrt(NaiveAnn.dot(qv, qv))
      rows.filter { case (n, nv) =>
          n != q && math.sqrt(NaiveAnn.dot(nv, nv)) > 0 }
        .map { case (n, nv) =>
          (n, NaiveAnn.dot(qv, nv) / (qn * math.sqrt(NaiveAnn.dot(nv, nv)))) }
        .filter { case (_, c) => c >= 0.2 && c < 0.8 }
        .sortBy { case (n, c) => (-c, n) }
        .take(5).zipWithIndex
        .map { case ((n, c), i) => (q, i + 1, n, NaiveAnn.round4(c)) }
    }
    assert(hard.sortBy(r => (r._1, r._2)) == expect)
  }
}
