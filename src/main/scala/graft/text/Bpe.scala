package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed merge training over the
  * word-frequency dim, per-document encoding as a native codegen
  * expression ([[graft.functions.BpeEncodeTokens]]).
  *
  * Extension surface (no reference counterpart): the builder brief asks
  * for token counting "whitespace + a BPE-ish regex"; this is the real
  * learned-subword path a training pipeline runs before packing.
  *
  * Scale shape (the part that must survive 100 TB):
  *
  *   - TRAINING never sees documents — it sees the word-frequency table:
  *     one explode + one map-side-combined `groupBy(word).count()`, then
  *     the driver-side merge loop runs over that vocab-sized dim (capped
  *     at `vocabCap` most-frequent words, the standard industrial BPE
  *     recipe — HF/SentencePiece trainers do exactly this). The merge
  *     loop cost is O(vocab × merges), independent of corpus size.
  *   - ENCODING is a pure full-corpus map: the learned merge ranks ride
  *     the closure (a few KB), each task encodes its documents with a
  *     per-executor word→tokens memo (word frequency follows Zipf, so the
  *     memo hit rate approaches 1 — each distinct word is BPE-merged once
  *     per executor, not once per occurrence). No shuffle anywhere.
  *
  * Determinism (every oracle pin depends on it): pair counts are exact
  * integers from an exact count; the best pair is chosen by
  * (count desc, left asc, right asc); training stops when no pair occurs
  * twice. Same corpus → same merges, bit-for-bit, at any partitioning.
  *
  * Encoding semantics are the standard lowest-rank-first greedy: find the
  * adjacent symbol pair with the smallest merge rank, fuse ALL its
  * occurrences left-to-right, repeat until no ranked pair remains. Two
  * independent implementations exist on purpose:
  * [[graft.functions.BpeEncodeTokens]] (array-based fast kernel, the
  * production path) and [[Bpe.referenceEncodeWord]] (list-based textbook
  * shape, the path that builds the DuckDB oracle's word→tokens dim) — so
  * the full-hash gate is a genuine fast-vs-reference differential over
  * the whole corpus, not a self-comparison.
  */
object Bpe {

  /** One learned merge: (left symbol, right symbol) at a rank equal to its
    * position in the merge list.
    */
  type Merge = (String, String)

  /** The word-frequency dim: one shuffle, map-side combined. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.whitespaceTokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Trained merge list plus the word-frequency table it was trained on
    * (count desc, word asc; at most `vocabCap` rows). `complete` is true
    * iff the table holds EVERY distinct corpus word — the precondition for
    * the oracle's literal word→tokens dim (false only past the cap, where
    * the gate degrades to the driver's rows-only check, documented).
    */
  final case class Trained(
      merges: Seq[Merge], wordFreq: Seq[(String, Long)], complete: Boolean)

  /** Train `numMerges` merges from the corpus word-frequency dim.
    *
    * The collect is bounded by `vocabCap` (the limit runs in the PLAN, not
    * after the fetch) — the same bounded-training-collect discipline as
    * `Ann.trainIvfCentroids`.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      vocabCap: Int = 65536): Trained = {
    require(numMerges >= 0 && vocabCap > 0,
      s"bad BPE params: numMerges=$numMerges vocabCap=$vocabCap")
    // cap+1 so we can DETECT truncation without a second count job
    val rows = wordCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("word"))
      .limit(vocabCap + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    val complete = rows.length <= vocabCap
    val freq = rows.take(vocabCap)
    Trained(trainFromCounts(freq, numMerges), freq, complete)
  }

  /** The driver-side merge loop over a word-frequency table — exact
    * integer pair counts, deterministic (count desc, pair asc) choice,
    * stop when the best pair occurs fewer than twice.
    */
  def trainFromCounts(freq: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    // each word as its current symbol sequence, seeded with single chars
    var words: Array[(Array[String], Long)] =
      freq.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = Vector.newBuilder[Merge]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[Merge, Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = counts.foldLeft(Option.empty[(Merge, Long)]) {
        case (acc, (p, c)) => acc match {
          case Some((bp, bc)) if bc > c => acc
          case Some((bp, bc)) if bc == c &&
            (bp._1 < p._1 || (bp._1 == p._1 && bp._2 <= p._2)) => acc
          case _ => Some((p, c))
        }
      }
      best match {
        case Some((pair, c)) if c >= 2 =>
          merges += pair
          words = words.map { case (syms, cnt) => (fuseAll(syms, pair), cnt) }
          m += 1
        case _ => exhausted = true
      }
    }
    merges.result()
  }

  /** Fuse every left-to-right occurrence of `pair` in one pass (the same
    * overlap rule both encoders use: "aaa" + (a,a) → [aa, a]).
    */
  private[text] def fuseAll(syms: Array[String], pair: Merge): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Textbook lowest-rank-first greedy encode of one word — the REFERENCE
    * implementation (idiomatic immutable-list shape, re-derives the best
    * pair by a full scan each round). Builds the oracle's word→tokens dim
    * and the differential baseline for the fast kernel; never on a hot
    * path.
    */
  def referenceEncodeWord(word: String, merges: Seq[Merge]): Seq[String] = {
    if (word.isEmpty) return Nil
    val rank = merges.zipWithIndex.toMap
    var syms: Vector[String] = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      val present = syms.zip(syms.tail).flatMap(p => rank.get(p).map(r => (r, p)))
      if (present.isEmpty) done = true
      else {
        val (_, bestPair) = present.minBy(_._1)
        syms = fuseAll(syms.toArray, bestPair).toVector
      }
    }
    syms
  }

  /** Encode a whole document with the reference path: whitespace words,
    * each reference-encoded, concatenated. Mirrors the fast kernel's
    * document semantics exactly: ASCII-space-only trim (Spark/DuckDB
    * `trim`, NOT java.lang.String#trim) then `\s+` split, empty words
    * skipped.
    */
  def referenceEncodeDoc(text: String, merges: Seq[Merge]): Seq[String] = {
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    val t = text.substring(lo, hi)
    if (t.isEmpty) Nil
    else t.split("\\s+").toSeq.filter(_.nonEmpty)
      .flatMap(w => referenceEncodeWord(w, merges))
  }

  /** Serialize the trained merge list to the deployable `merges.tsv` form
    * (`rank\tleft\tright`, ranks dense from 0) — what [[loadMerges]] and a
    * serving/streaming encoder read back.
    */
  def renderMerges(merges: Seq[Merge]): String =
    merges.zipWithIndex.map { case ((l, r), i) => s"$i\t$l\t$r" }
      .mkString("", "\n", "\n")

  /** Parse a merges.tsv artifact back into the merge list. Fails loud on a
    * malformed or rank-gapped file — a silently reordered merge list would
    * produce a DIFFERENT tokenization with no error anywhere downstream.
    */
  def parseMerges(tsv: String): Seq[Merge] = {
    val lines = tsv.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    val parsed = lines.map { l =>
      val parts = l.split("\t", -1)
      require(parts.length == 3, s"malformed merges.tsv line: '$l'")
      (parts(0).toInt, (parts(1), parts(2)))
    }
    parsed.zipWithIndex.foreach { case ((rank, _), i) =>
      require(rank == i, s"merges.tsv ranks must be dense from 0; " +
        s"line $i carries rank $rank")
    }
    parsed.map(_._2)
  }

  /** Load a merges.tsv artifact from disk. */
  def loadMerges(path: String): Seq[Merge] =
    parseMerges(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** The production encode column: native codegen expression over the raw
    * text (split + per-word greedy merge + concat in one kernel).
    */
  def encodeTokens(text: Column, merges: Seq[Merge]): Column = {
    import org.apache.spark.sql.graft.GraftColumnBridge.{column, expression}
    column(graft.functions.BpeEncodeTokens(expression(text),
      merges.toArray.map(p => Array(p._1, p._2))))
  }
}
