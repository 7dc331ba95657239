package graft.ann

/** r19 measurement probe: CPU time of the HNSW shard build + frozen
  * queries, primitive rewrite vs the verbatim boxed r18 copy
  * ([[LegacyHnsw]]), same JVM, order-alternated passes (the
  * HnswAutoOrderProbe lesson: successive builds speed up ~10% from JIT,
  * so a fixed order manufactures a gap).
  *
  * Usage: Test/runMain graft.ann.HnswCpuProbe [nRows] [dim] [m] [ef]
  */
object HnswCpuProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 60000
    val dim = if (args.length > 1) args(1).toInt else 64
    val m = if (args.length > 2) args(2).toInt else 16
    val ef = if (args.length > 3) args(3).toInt else 128
    val rnd = new scala.util.Random(42)
    val rows = Array.tabulate(n) { i =>
      val raw = Array.fill(dim)(rnd.nextGaussian())
      val norm = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(_ / norm))
    }
    val queries = rows.take(50)

    def timeNew(): (Double, Double) = {
      val t0 = System.nanoTime()
      val g = new Ann.HnswGraph(m, math.max(ef, 2 * m))
      rows.foreach { case (id, v) => g.insert(id, v) }
      val fs = g.freeze(-1L, -1)
      val t1 = System.nanoTime()
      var acc = 0.0
      queries.foreach { case (qid, qv) =>
        acc += Ann.searchFrozen(fs, qv, qid, 10, ef).map(_._2).sum
      }
      val t2 = System.nanoTime()
      if (acc.isNaN) println("nan")
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }
    def timeOld(): (Double, Double) = {
      val t0 = System.nanoTime()
      val g = new LegacyHnsw(m, math.max(ef, 2 * m))
      rows.foreach { case (id, v) => g.insert(id, v) }
      val t1 = System.nanoTime()
      var acc = 0.0
      queries.foreach { case (qid, qv) =>
        acc += g.searchBoxed(qv, qid, 10, ef).map(_._2).sum
      }
      val t2 = System.nanoTime()
      if (acc.isNaN) println("nan")
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }

    // order-alternated passes: old,new / new,old / old,new / new,old
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
    for (p <- 1 to 4) {
      if (p % 2 == 1) {
        val o = timeOld(); results += (("old", o._1, o._2))
        val nw = timeNew(); results += (("new", nw._1, nw._2))
      } else {
        val nw = timeNew(); results += (("new", nw._1, nw._2))
        val o = timeOld(); results += (("old", o._1, o._2))
      }
      System.gc()
    }
    results.foreach { case (k, b, q) =>
      println(f"[hnswcpu] $k build=$b%7.2fs queries50=$q%6.3fs  (n=$n dim=$dim m=$m ef=$ef)")
    }
    val ob = results.filter(_._1 == "old").map(_._2).min
    val nb = results.filter(_._1 == "new").map(_._2).min
    println(f"[hnswcpu] best build: old=$ob%.2fs new=$nb%.2fs ratio=${nb / ob}%.3f")
  }
}
