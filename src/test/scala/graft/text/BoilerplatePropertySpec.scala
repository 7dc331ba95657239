package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Randomized equivalence sweep for [[TextOps.stripBoilerplate]] — the
  * DedupPropertySpec treatment: mutation-structured random corpora
  * (shared headers/footers/mid-chunks planted at varied frequencies,
  * lengths straddling chunk boundaries) must equal an independent
  * in-test reference computation of the rule. The planted
  * [[BoilerplateSpec]] cases pin specific behaviors; this sweeps their
  * composition.
  */
class BoilerplatePropertySpec extends SparkSpec {
  import spark.implicits._

  private def reference(
      rows: Seq[(Long, String, String)],
      ck: Int, minDocs: Int, minFrac: Double): Map[Long, (Int, Int, String)] = {
    def toks(t: String): Array[String] = t.trim.split("\\s+")
    def chunks(t: String): Seq[String] = {
      val w = toks(t)
      (0 until w.length / ck).map(i => w.slice(i * ck, i * ck + ck).mkString(" "))
    }
    val perSource = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val hot: Map[String, Set[String]] = rows.groupBy(_._2).map { case (src, rs) =>
      val freq = rs.flatMap { case (id, _, t) => chunks(t).distinct.map((_, id)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
      val bar = math.max(minDocs.toLong, math.ceil(minFrac * perSource(src)).toLong)
      src -> freq.collect { case (c, nd) if nd >= bar => c }.toSet
    }
    rows.map { case (id, src, t) =>
      val w = toks(t)
      val cs = chunks(t)
      val drop = cs.zipWithIndex.collect { case (c, i) if hot(src)(c) => i }.toSet
      val kept = w.zipWithIndex.collect {
        case (tok, i) if i >= (w.length / ck) * ck || !drop(i / ck) => tok
      }
      id -> ((w.length / ck, drop.size, kept.mkString(" ")))
    }.toMap
  }

  test("random corpora: operator equals the reference at three thresholds") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho", "sig")
    (1 to 4).foreach { round =>
      val nSrc = 2 + rnd.nextInt(3)
      // per-source planted chrome: a header chunk and a mid chunk
      val chrome = (0 until nSrc).map { s =>
        (0 until 8).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val rows = (0 until nSrc).flatMap { s =>
        val nDocs = 4 + rnd.nextInt(12)
        (0 until nDocs).map { d =>
          val id = (s * 1000 + d).toLong
          val bodyLen = rnd.nextInt(30)
          val body = (0 until bodyLen).map(_ => vocab(rnd.nextInt(vocab.size)))
          val withHeader = rnd.nextDouble() < 0.5
          val withMid = rnd.nextDouble() < 0.3
          val parts =
            (if (withHeader) Seq(chrome(s)) else Nil) ++
              body.take(bodyLen / 2) ++
              (if (withMid) Seq(chrome((s + 1) % nSrc)) else Nil) ++
              body.drop(bodyLen / 2)
          (id, s"src$s", parts.mkString(" "))
        }
      }
      val df = rows.toDF("doc_id", "source", "text")
      for ((minDocs, minFrac) <- Seq((2, 0.0), (3, 0.0), (2, 0.4))) {
        val got = TextOps.stripBoilerplate(df, 8, minDocs, minFrac)
          .select(col("doc_id"), col("n_chunks"), col("n_dropped"), col("clean_text"))
          .as[(Long, Int, Int, String)].collect()
          .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
        val want = reference(rows, 8, minDocs, minFrac)
        assert(got.keySet == want.keySet)
        got.keySet.toSeq.sorted.foreach { id =>
          assert(got(id) == want(id),
            s"round $round thr=($minDocs,$minFrac) doc $id: " +
              s"got=${got(id)} want=${want(id)} text='${rows.find(_._1 == id).get._3}'")
        }
      }
    }
  }
}
