package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OpsSpec extends SparkSpec {

  test("RangeJoin.pointInInterval matches brute-force non-equi join") {
    import spark.implicits._
    val points = Seq.tabulate(200)(i => (i.toLong, (i * 7 % 97).toLong)).toDF("pid", "p")
    val intervals = Seq.tabulate(30) { i =>
      val s = (i * 11 % 80).toLong; (i.toLong, s, s + (i % 13).toLong)
    }.toDF("iid", "s", "e")

    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 8L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.join(intervals, $"p" >= $"s" && $"p" <= $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("RangeJoin.intervalOverlap matches brute-force, no duplicate pairs") {
    import spark.implicits._
    val l = Seq.tabulate(40) { i =>
      val s = (i * 13 % 100).toLong; (i.toLong, s, s + (i % 17).toLong)
    }.toDF("lid", "ls", "le")
    val r = Seq.tabulate(40) { i =>
      val s = (i * 7 % 90).toLong; (i.toLong, s, s + (i % 11).toLong)
    }.toDF("rid", "rs", "re")

    val got = RangeJoin.intervalOverlap(l, "ls", "le", r, "rs", "re", 6L)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    val want = l.join(r, $"ls" <= $"re" && $"rs" <= $"le")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got.toSet === want)
    assert(got.size === got.toSet.size, "bucket dedup guard must emit each pair once")
  }

  test("AsOfJoin.join picks latest right row with rightTime <= leftTime") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 7L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 9L, 100L), (1L, 10L, 101L), (1L, 15L, 102L), (2L, 6L, 200L))
      .toDF("k", "t", "v")

    val got = AsOfJoin.join(left, right, "k", "t", Seq("v"))
      .select($"tag", $"asof_v").as[(String, Option[Long])].collect().toMap
    // tag a: t=10 -> right t=10 (equal counts), v=101
    // tag b: t=20 -> right t=15, v=102
    // tag c: t=5  -> no right <= 5 -> null
    // tag d: k=3 has no right rows -> null
    assert(got === Map("a" -> Some(101L), "b" -> Some(102L), "c" -> None, "d" -> None))
  }

  test("AsOfJoin tiebreak: greatest tiebreak wins among equal times") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1L), (1L, 10L, 3L), (1L, 10L, 2L)).toDF("k", "t", "v")
    val got = AsOfJoin.join(left, right, "k", "t", Seq("v"), tiebreakCol = "v")
      .select($"asof_v").as[Long].collect()
    assert(got.toSeq === Seq(3L))
  }

  test("GlobalOrder.withRowNumber equals a global row_number, many partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = Seq.fill(500)((rnd.nextInt(1000), rnd.alphanumeric.take(6).mkString))
      .zipWithIndex.map { case ((n, s), i) => (i.toLong, s, n) }
      .toDF("id", "name", "n")
      .repartition(7)
    val got = GlobalOrder.withRowNumber(df, "ord", col("name"), col("id"))
      .select($"ord", $"id").as[(Long, Long)].collect().sortBy(_._1)
    val want = df.select($"name", $"id").as[(String, Long)].collect()
      .sortBy(identity).map(_._2).zipWithIndex
      .map { case (id, i) => ((i + 1).toLong, id) }
    assert(got.toSeq === want.toSeq)
    // (no single-partition exchange by construction: the plan is a range
    // repartition + within-partition sort + zipWithIndex — partition count
    // on this tiny input may still be AQE-coalesced to 1, which is fine)
  }

  test("Salt.saltedJoin equals the plain join on a 90%-hot-key table") {
    import spark.implicits._
    // 900 rows of key 7 (the hot key), 100 spread across other keys
    val left = (Seq.fill(900)(7) ++ Seq.tabulate(100)(_ % 10))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "lv")
    val right = Seq.tabulate(10)(k => (k, s"dim_$k")).toDF("k", "rv")
    val got = Salt.saltedJoin(left, right, Seq("k"), salts = 8)
      .select($"k", $"lv", $"rv").as[(Int, Long, String)].collect().sorted
    val want = left.join(right, "k")
      .select($"k", $"lv", $"rv").as[(Int, Long, String)].collect().sorted
    assert(got.toSeq === want.toSeq)
    assert(got.length === 1000)
  }

  test("DistributedLag.withLag equals a global lag window, many partitions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((1 to 500).toList).map(i => (i, i * 3L))
    val df = rows.toDF("k", "v").repartition(17)
    val got = DistributedLag.withLag(df, "v", "prev_v", -1L, col("k"))
      .select($"k", $"v", $"prev_v").as[(Int, Long, Long)].collect().sortBy(_._1)
    val want = df
      .withColumn("prev_v", lag($"v", 1, -1L).over(Window.orderBy($"k")))
      .select($"k", $"v", $"prev_v").as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    assert(got.head._3 === -1L)
  }

  test("DistributedLag carries across empty range partitions") {
    import spark.implicits._
    // two far-apart key clusters force empty middle range partitions when
    // the source has more partitions than distinct keys
    val df = (Seq.tabulate(5)(i => (i, i.toLong)) ++ Seq.tabulate(5)(i => (i + 1000, 100L + i)))
      .toDF("k", "v").repartition(32)
    val got = DistributedLag.withLag(df, "v", "prev_v", 0L, col("k"))
      .select($"k", $"prev_v").as[(Int, Long)].collect().sortBy(_._1)
    assert(got.find(_._1 == 1000).map(_._2) === Some(4L)) // carried over the gap
    assert(got.head === ((0, 0L)))
  }

  test("PrefixSum.withRunningTotal equals a global running-sum window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle((1 to 400).toList).map(i => (i, rnd.nextInt(50).toLong))
    val df = rows.toDF("k", "v").repartition(13)
    val got = PrefixSum.withRunningTotal(df, "v", "running", col("k"))
      .select($"k", $"running").as[(Int, Long)].collect().sortBy(_._1)
    val want = df
      .withColumn("running", sum($"v").over(
        Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"k", $"running").as[(Int, Long)].collect().sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("Salt.saltedAgg equals direct aggregation (sum + count monoids)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(2000)((if (rnd.nextInt(10) < 8) 1 else rnd.nextInt(50), rnd.nextInt(100)))
      .toDF("k", "v")
    val got = Salt.saltedAgg(df, Seq("k"), salts = 8,
        partial = Seq(sum($"v") -> "total", count(lit(1)) -> "n"),
        merge = n => sum(col(n)))
      .select($"k", $"total", $"n").as[(Int, Long, Long)].collect().sorted
    val want = df.groupBy($"k")
      .agg(sum($"v").as("total"), count(lit(1)).as("n"))
      .select($"k", $"total", $"n").as[(Int, Long, Long)].collect().sorted
    assert(got.toSeq === want.toSeq)
  }
}
