package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scale-corpus generator's environment guards (r17 verdict ask #6:
  * does ensureScaleCorpus hold when /tmp is near-full?). The crash-safety
  * contract (temp-dir + rename-into-place) is exercised by every envelope
  * run; what was untested is the NEAR-FULL path — the corpus temp dir and
  * the envelopes' ~50 GB spill share one filesystem, so generation into a
  * nearly-full disk must fail loudly BEFORE writing, with the real cause
  * in the message, not a generator exit code.
  */
class ScaleCorpusGuardSpec extends AnyFunSuite {

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_corpus_guard")
    d.resolve("corpus").toString
  }

  test("near-full disk fails loud with the cause BEFORE any generator work") {
    val target = freshDir()
    val e = intercept[IllegalArgumentException] {
      // a petabyte floor no box satisfies — the guard must fire first
      Bench.ensureScaleCorpus("sf1", target, 1,
        Seq("documents.parquet"), minFreeGb = 1e6)
    }
    assert(e.getMessage.contains("GB free"))
    assert(e.getMessage.contains("spill"))
    // nothing was written: no partial corpus, no leaked temp dir
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(target)))
    val parent = java.nio.file.Paths.get(target).getParent
    import scala.jdk.CollectionConverters._
    val leaked = java.nio.file.Files.list(parent).iterator().asScala
      .filter(_.getFileName.toString.startsWith(".gen_")).toSeq
    assert(leaked.isEmpty, s"leaked temp dirs: $leaked")
  }

  test("existing complete corpus short-circuits BEFORE the disk guard (no regeneration storm when full)") {
    val target = freshDir()
    val root = java.nio.file.Paths.get(target)
    java.nio.file.Files.createDirectories(root)
    java.nio.file.Files.writeString(root.resolve("documents.parquet"), "x")
    // with the required file present, even an impossible floor must not
    // throw: a full disk never blocks USING an already-generated corpus
    Bench.ensureScaleCorpus("sf1", target, 1,
      Seq("documents.parquet"), minFreeGb = 1e6)
  }

  test("a failing generator still surfaces its own named cause (exit path unchanged by the guard)") {
    val target = freshDir()
    val e = intercept[IllegalArgumentException] {
      Bench.ensureScaleCorpus("not_a_scale", target, 1,
        Seq("documents.parquet"), minFreeGb = 0.0)
    }
    assert(e.getMessage.contains("gen_scale_corpus.py"))
  }
}
