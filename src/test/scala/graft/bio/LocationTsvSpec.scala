package graft.bio

import org.scalatest.funsuite.AnyFunSuite
import graft.io.EcocycRecord

class LocationTsvSpec extends AnyFunSuite {

  private val eco = Map(
    "thrA" -> EcocycRecord("thrA", "protein", "aspartate kinase", "", -1, -1, 337, 2799, "2463", "gene"))

  private def hit(start: Int, end: Int, locations: Seq[LocationHit], mask: String = "****") =
    LocatedHit("m1", start, end, isReverse = start > end, 4.0,
      Map("consistency" -> 4.0, "direct" -> 3.0),
      "acgt", "acgt", mask, locations)

  test("runIntervals: '.' resets, '-' extends, 1-based pairs, single emit per run") {
    assert(LocationTsv.runIntervals("****", 4) === Seq((1, 4)))
    // the '-' at position 6 extends the run to reach 3
    assert(LocationTsv.runIntervals("**.**-*", 3) === Seq((4, 6)))
    assert(LocationTsv.runIntervals("**.*", 2) === Seq((1, 2)))
    // score grows PAST best without re-emitting (exact-equality check)
    assert(LocationTsv.runIntervals("*****", 4) === Seq((1, 4)))
    assert(LocationTsv.runIntervals("****.****", 4) === Seq((1, 4), (6, 9)))
  }

  test("locationLabel: equal directions → antisense; utr suffix for 5'/3'") {
    assert(LocationTsv.locationLabel("cds", '>', '>') === "antisense cds")
    assert(LocationTsv.locationLabel("cds", '>', '<') === "sense cds")
    // apostrophe KEPT — pinned by the executed-reference format golden
    assert(LocationTsv.locationLabel("5'", '<', '<') === "antisense 5'utr")
    assert(LocationTsv.locationLabel("3'", '>', '<') === "sense 3'utr")
    assert(LocationTsv.locationLabel("inter-genic", '>', '>') === "inter genic")
  }

  test("rows enrich from the EcoCyc table; misses keep gene_name only") {
    val locs = Seq(
      LocationHit("cds", "thrA", "aspartate kinase", 337, 2799, true, ">>>>>", ">>*>>"),
      LocationHit("5'", "mystery", "", 10, 400, true, ">>>>>", "*>>>>"))
    val rs = LocationTsv.rows(1, hit(400, 403, locs), eco)
    assert(rs.length === 2)
    assert(rs(0).values("location") === "antisense cds")
    assert(rs(0).values("type") === "gene")
    assert(rs(0).values("product") === "aspartate kinase")
    assert(rs(1).values("location") === "antisense 5'utr")
    assert(!rs(1).values.contains("type"))
    assert(rs(0).values("site") === "400-403")
  }

  test("render pads dynamic trailing interval columns to the widest row") {
    val locs = Seq(LocationHit("cds", "thrA", "p", 337, 2799, true, ">>>", "***"))
    val r1 = LocationTsv.rows(1, hit(400, 403, locs, mask = "****"), eco)       // 1 interval
    val r2 = LocationTsv.rows(2, hit(500, 504, locs, mask = "****.****"), eco)  // 2 intervals
    val text = LocationTsv.render(r1 ++ r2)
    val lines = text.linesIterator.toVector
    val header = lines.head.split("\t")
    assert(header.takeRight(4).toSeq ===
      Seq("location start 1", "location end 1", "location start 2", "location end 2"))
    // every line has the same column count
    assert(lines.forall(_.split("\t", -1).length === header.length))
    // row 1 padded with empty trailing cells
    assert(lines(1).split("\t", -1).takeRight(2).toSeq === Seq("", ""))
  }
}
