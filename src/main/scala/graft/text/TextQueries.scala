package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ann.Ann
import graft.multimodal.Multimodal

/** Training-data pipeline operators (dedup / similarity search / text
  * analysis / multimodal plumbing) as driver-gate queries over the
  * `documents` and `embeddings` tables, each with a DuckDB oracle that
  * replicates the arithmetic exactly (same fold order, same rounding).
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  private[graft] val qualityStopwords = Seq("the", "a", "of", "and", "to", "is")

  /** cur_corpus, parameterized: quality gate at `minQuality` -> normalized
    * dedup (keep each cluster's min-id doc) -> survivors with their stats.
    * The threshold is applied BEFORE representative selection so a stricter
    * gate never silently drops a whole cluster because its min-id member
    * failed while others passed (the CLI `--min-quality` knob threads here).
    */
  def curateCorpus(s: SparkSession, d: String, minQuality: Double): DataFrame = {
    val kept = Tables.documents(s, d).select(
        col("doc_id"), col("lang"), col("text"),
        TextOps.qualityScore(col("text"), qualityStopwords).as("quality"))
      .where(col("quality") >= minQuality)
    val canon = kept
      .groupBy(TextOps.normalizeText(col("text")).as("nt"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
      .select(col("doc_id"), col("n_dups"))
    canon.join(kept, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_dups"),
        size(TextOps.whitespaceTokens(col("text"))).as("n_tokens"), col("quality"))
      .orderBy("doc_id")
  }

  /** cur_semantic, parameterized: quality gate at `minQuality`, then drop
    * embedding-cosine near-dups among the survivors (keep each pair's min
    * id). See the registry entry for the plan shape.
    */
  def curateSemantic(s: SparkSession, d: String, minQuality: Double): DataFrame = {
    val kept = Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text"), qualityStopwords).as("quality"))
      .where(col("quality") >= minQuality)
    val emb = Tables.embeddings(s, d)
      .join(kept.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val drop = Ann.cosinePairs(emb, "vec_id", "embedding", 0.4)
      .select(col("b").as("doc_id")).distinct()
    kept.join(broadcast(drop), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy("doc_id")
  }

  /** cur_semantic_ivf — the 100 TB composition of the SAME curation rule:
    * quality gate, then drop embedding-cosine near-dups among the
    * survivors (keep each pair's min id), with the pair relation coming
    * from [[Ann.cosinePairsIvfWithCentroids]] instead of the brute O(n²)
    * triangle sweep — work Σ c² over IVF cell sizes, exact verify inline,
    * so only RECALL is approximate (a near-dup pair whose vectors share
    * none of their probed cells survives curation; `nProbe` is the
    * measured recall lever — pair recall 0.61→0.96+ from 2→4 at 16 cells
    * on the gaussian worst case, AnnIvfPairsSpec, hence the nProbe=4
    * default; at nProbe = numCells the composition equals
    * [[curateSemantic]] exactly, the property CurationSamplingSpec pins).
    * Centroids train on the KEPT
    * subset (deterministic, memoized for the oracle dump: the oracle
    * embeds them and replicates the full candidate rule, so the hash gate
    * is exact regardless of recall). Unlike the brute tier, the drop-list
    * anti-join carries NO broadcast hint: in the duplicate-heavy regime
    * this path exists for, the drop list is O(corpus) and a forced
    * broadcast collects it to the driver (the r13 ADVICE rule) — AQE
    * decides, as in Dedup.canonicalDocsRouted.
    */
  def curateSemanticIvf(s: SparkSession, d: String, minQuality: Double,
      threshold: Double = 0.4, numCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val kept = Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text"), qualityStopwords).as("quality"))
      .where(col("quality") >= minQuality)
    val emb = Tables.embeddings(s, d)
      .join(kept.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val cents = Ann.trainIvfCentroids(emb, "vec_id", "embedding",
      numCells = numCells, lloydIters = 2, trainCap = 4096)
    semanticIvfCents.set(cents)
    val drop = Ann.cosinePairsIvfWithCentroids(
        emb, "vec_id", "embedding", threshold, nProbe, cents)
      .select(col("b").as("doc_id")).distinct()
    kept.join(drop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy("doc_id")
  }

  /** The measured brute/IVF crossover for the semantic-curation pair
    * sweep, in KEPT-embedding count (the quality gate shrinks the swept
    * set, so the corpus row count is the wrong signal): brute wins at
    * 5.5k kept vectors (sf1: 2.79 s vs 3.42 s — the quantizer training +
    * extra stage aren't paid back), the IVF path wins 3.5× at 20k
    * (dd_cosine_neardup sf1 envelope: 4.37 s vs 1.27 s). Biased LOW for
    * the same reason as [[Dedup.RoutedDocCutover]]: the IVF side's worst
    * case is a bounded ~25% overhead, the brute side's is unbounded n²
    * blowup.
    */
  val SemanticEmbCutover: Long = 10000L

  /** Auto-routed semantic curation — the [[Dedup.canonicalDocsAuto]]
    * decision shape applied to this composition: ONE cheap pass counts
    * the quality-KEPT embeddings (ids only — no content shuffles), then
    * picks [[curateSemantic]] (exact brute sweep) below
    * [[SemanticEmbCutover]] and [[curateSemanticIvf]] (Σ c² bucketed
    * sweep, probabilistic drop recall) above it.
    */
  def curateSemanticAuto(s: SparkSession, d: String, minQuality: Double,
      threshold: Double = 0.4, numCells: Int = 16, nProbe: Int = 4,
      embCutover: Long = SemanticEmbCutover): DataFrame = {
    val keptIds = Tables.documents(s, d).select(
        col("doc_id").as("vec_id"),
        TextOps.qualityScore(col("text"), qualityStopwords).as("q"))
      .where(col("q") >= minQuality).select("vec_id")
    val keptEmb = Tables.embeddings(s, d)
      .join(keptIds, Seq("vec_id"), "left_semi").count()
    if (keptEmb >= embCutover)
      curateSemanticIvf(s, d, minQuality, threshold, numCells, nProbe)
    else curateSemantic(s, d, minQuality)
  }

  /** Deterministic PII injection for the cur_pii_* gates (the mm_ payload
    * pattern: the synthetic corpus has no PII, so the query builds it
    * in-query and the oracle replicates the construction exactly).
    * doc_id % 4 selects the kind — 0 email, 1 phone, 2 IPv4, 3 control
    * (no injection) — except doc_id % 8 == 7, which gets ALL THREE kinds
    * concatenated so the multi-kind redaction ordering is exercised.
    * All digits derive from doc_id; lpad (not format_string) because both
    * engines share it byte-for-byte.
    */
  private[text] def piiInjectedDocs(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    val email = concat(lit(" reach user"), s(id), lit("@mail"),
      s(id % 7), lit(".example.com"))
    val phone = concat(lit(" call "),
      lpad(s(id % 1000), 3, "0"), lit("-"),
      lpad(s((id * 7) % 1000), 3, "0"), lit("-"),
      lpad(s((id * 13) % 10000), 4, "0"), lit(" now"))
    val ip = concat(lit(" host "),
      s(id % 256), lit("."), s((id * 3) % 256), lit("."),
      s((id * 5) % 256), lit("."), s((id * 7) % 256), lit(" up"))
    val suffix = when(id % 8 === 7, concat(email, phone, ip))
      .when(id % 4 === 0, email)
      .when(id % 4 === 1, phone)
      .when(id % 4 === 2, ip)
      .otherwise(lit(""))
    docs.select(id, col("lang"), concat(col("text"), suffix).as("text"))
  }

  /** Decontamination survivors: docs at or above `benchBelow` that share
    * NO 3-token shingle with the benchmark set (docs below `benchBelow`),
    * as (doc_id, text_len). Two verified-identical paths: the exact
    * broadcast-semi-join (small bench sets) and the bloom-prefiltered
    * scale path (`useBloom` — see `cur_decontaminate_bloom`'s scaladoc).
    * Parameterized for the curate CLI's `--decontaminate-below`; the two
    * gate queries call this with the pinned boundary 20.
    */
  def decontaminateSurvivors(
      s: SparkSession, d: String, benchBelow: Long, useBloom: Boolean): DataFrame = {
    val docs = Tables.documents(s, d)
    val hashed = Dedup.hashedShingleDocs(docs, "doc_id", "text")
    val benchShingles = hashed.where(col("doc_id") < benchBelow)
      .select(explode(col("hs")).as("sh")).distinct()
    val corpusShingles = hashed.where(col("doc_id") >= benchBelow)
      .select(col("doc_id"), explode(col("hs")).as("sh"))
    val contaminated =
      if (!useBloom) {
        corpusShingles
          .join(broadcast(benchShingles), Seq("sh"), "left_semi")
          .select("doc_id").distinct()
      } else {
        // capacity derives from the ACTUAL bench-set cardinality (floored
        // at 128k) — `benchBelow` is caller-controlled now, and a
        // hardcoded capacity would silently saturate the filter (FPP → 1,
        // scale premise gone) on a large benchmark slice; the count is
        // one cheap agg over the small-by-premise bench side
        val expected = math.max(1L << 17, benchShingles.count())
        val bloom = benchShingles.stat.bloomFilter("sh", expected, 0.01)
        val bc = s.sparkContext.broadcast(bloom)
        import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
        corpusShingles
          .where(colOf(graft.functions.BloomMightContainLong(expression(col("sh")), bc)))
          .join(benchShingles, Seq("sh"), "left_semi")
          .select("doc_id").distinct()
      }
    docs.where(col("doc_id") >= benchBelow)
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), length(col("text")).as("text_len"))
      .orderBy("doc_id")
  }

  /** Shared mixing-rate dim for the sm_temperature* family: per source,
    * `rate1e6` = ppm keep/repeat rate ∝ n^(alpha−1) with alpha = 0.5,
    * normalized so the expected output is `budgetFrac` × corpus. The
    * normalizer folds sqrt counts in ASCENDING SORTED order (identical
    * IEEE fold to the oracle's list_sort + list_reduce); everything after
    * the single rate double is ppm integer arithmetic.
    */
  private def temperatureRates(docs: DataFrame, budgetFrac: Double): DataFrame = {
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val denom = counts.agg(
      aggregate(sort_array(collect_list(sqrt(col("n").cast("double")))),
        lit(0.0), (a, x) => a + x).as("denom"),
      sum(col("n")).as("total"))
    counts.crossJoin(broadcast(denom))
      .withColumn("rate1e6", floor(lit(1000000.0) *
        (col("total").cast("double") * budgetFrac) *
        sqrt(col("n").cast("double")) / col("denom") /
        col("n").cast("double")).cast("long"))
  }

  /** sm_temperature core (downsampling form, rate clamped at 1): exposed
    * so specs can exercise the damping/budget properties on PLANTED
    * skewed corpora — the driver tables carry exactly-uniform sources,
    * where every rate is identical and the properties are vacuous.
    */
  private[text] def temperatureSample(docs: DataFrame): DataFrame = {
    val rates = temperatureRates(docs, 0.25)
      .withColumn("thr", least(lit(1000000L), col("rate1e6")))
    docs.join(broadcast(rates.select(col("source"), col("thr"))), Seq("source"))
      .where(Sampling.hashBucket(col("doc_id"), 1000000) < col("thr"))
      .select(col("doc_id"), col("source"), col("thr"))
      .orderBy("doc_id")
  }

  /** sm_mixture core: EXPLICIT per-source target weights — the
    * DoReMi/Pile deployment shape, where the mixture is a CONFIG decision
    * (tuned weights per domain), not a function of corpus counts like
    * [[temperatureSample]]'s n^α rule. target_s = floor(budget·w_s/Σw),
    * keep-rate = min(1, target_s/n_s) as an exact integer ppm threshold
    * on the shared doc-id hash (downsample-only; compose with
    * [[temperatureEpochs]]'s copy emission when a source must upsample).
    * Weights here derive deterministically from the source NAME (1 +
    * ascii(last char) mod 5) so the gate pins a non-trivial mixture
    * without a config side-channel; production callers pass real weights
    * through the same arithmetic. Every op after the two tiny dims is
    * integer (sums ≪ 2^52, so both engines' division-floor chains are
    * exact). Scale shape: two broadcast dims + one scan-stage filter —
    * no corpus shuffle.
    */
  private[text] def mixtureSample(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("source").agg(count(lit(1)).cast("long").as("n"))
      .withColumn("wraw",
        (lit(1L) + pmod(ascii(substring(col("source"), -1, 1)).cast("long"), lit(5L))))
    val tot = counts.agg(sum("n").cast("long").as("total"),
      sum("wraw").cast("long").as("wsum"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("budget", floor(col("total") / 2.0).cast("long"))
      .withColumn("target", floor(col("budget") * col("wraw") / col("wsum")).cast("long"))
      .withColumn("thr",
        least(lit(1000000L), floor(col("target") * 1000000.0 / col("n")).cast("long")))
      .select(col("source"), col("thr"))
    docs.join(broadcast(rates), Seq("source"))
      .where(Sampling.hashBucket(col("doc_id"), 1000000) < col("thr"))
      .select(col("doc_id"), col("source"), col("thr"))
      .orderBy("doc_id")
  }

  /** sm_temperature_epochs core (full resampling form, budget = corpus
    * size): floor(rate) whole copies per doc plus one more under the
    * fractional-remainder hash — small sources upsample past 1×, large
    * ones thin out.
    */
  private[text] def temperatureEpochs(docs: DataFrame): DataFrame = {
    val rates = temperatureRates(docs, 1.0)
    docs.join(broadcast(rates.select(col("source"), col("rate1e6"))), Seq("source"))
      .withColumn("n_copies",
        floor(col("rate1e6") / 1000000.0).cast("long") +
          when(Sampling.hashBucket(col("doc_id"), 1000000) <
            col("rate1e6") % 1000000L, 1L).otherwise(0L))
      .where(col("n_copies") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
      .orderBy("doc_id", "copy")
  }

  val queries: Map[String, Q] = Map(

    // ---- text analysis -------------------------------------------------

    "tx_token_count" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(TextOps.whitespaceTokens(col("text"))).as("n_ws"),
        size(TextOps.regexTokens(col("text"))).as("n_re"))
        .orderBy("doc_id")
    },

    "tx_quality_score" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(TextOps.whitespaceTokens(col("text"))).as("n_tokens"),
        TextOps.qualityScore(col("text"), qualityStopwords).as("quality"))
        .orderBy("doc_id")
    },

    "tx_lang_id" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        TextOps.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    },

    "tx_fingerprint" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextOps.polyHash(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // the quality FILTER a training pipeline runs with the score: keep
    // docs above threshold, report the survivors — scan + filter, no
    // shuffle until the final sort
    "tx_filter_quality" -> { (s, d) =>
      Tables.documents(s, d).select(
          col("doc_id"), col("lang"),
          TextOps.qualityScore(col("text"), qualityStopwords).as("quality"))
        .where(col("quality") >= 0.4)
        .orderBy("doc_id")
    },

    // repetition-based quality signals (Gopher-style): duplicated-token
    // fraction and the top-bigram share — scan-stage compute, no shuffle
    // until the final sort
    "tx_repetition" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextOps.repetitionStats(col("text")).as("r"))
        .select(col("doc_id"), col("r._1").as("n_tokens"),
          col("r._2").as("dup_token_frac"), col("r._3").as("top_bigram_frac"))
        .orderBy("doc_id")
    },

    // learned-subword tokenization (the real-tokenizer step behind
    // tx_token_count's "BPE-ish regex" placeholder): merges train on the
    // word-frequency DIM (one map-side-combined count; the driver merge
    // loop is O(vocab × merges), corpus-size-independent), then encoding
    // is a pure full-corpus map through the native BpeEncodeTokens kernel
    // — no shuffle until the final sort. The oracle's word→tokens dim is
    // built by the INDEPENDENT textbook encoder (Bpe.referenceEncodeWord),
    // so the hash gate is a fast-vs-reference differential at corpus scale
    "tx_bpe_encode" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val trained = Bpe.train(docs, "text", numMerges = 24)
      bpeTrained.set(trained)
      docs.select(col("doc_id"),
          Bpe.encodeTokens(col("text"), trained.merges).as("toks"))
        .select(col("doc_id"), size(col("toks")).as("n_bpe"),
          array_join(col("toks"), "|").as("bpe_text"))
        .orderBy("doc_id")
    },

    // the per-(source, lang) corpus card a curation run reports: doc and
    // token counts, mean quality, low-quality share — one scan, one
    // keyed agg (map-side combined). Quality means use the e4 fixed-point
    // rule (sum exact integers, divide once) so no float fold-order or
    // DuckDB CAST-rounds-vs-Spark-truncates trap can bite
    "cur_corpus_report" -> { (s, d) =>
      val q = TextOps.qualityScore(col("text"), qualityStopwords)
      Tables.documents(s, d)
        .select(col("source"), col("lang"),
          size(TextOps.whitespaceTokens(col("text"))).cast("long").as("n_toks"),
          q.as("q"))
        .select(col("source"), col("lang"), col("n_toks"), col("q"),
          floor(col("q") * lit(10000.0) + lit(0.5)).cast("long").as("q_e4"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_toks").as("n_tokens"),
          sum("q_e4").as("q_sum_e4"),
          sum(when(col("q") < 0.4, 1L).otherwise(0L)).as("n_low_quality"))
        .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
          floor(col("q_sum_e4").cast("double") / col("n_docs")).cast("long")
            .as("mean_quality_e4"),
          col("n_low_quality"))
        .orderBy("source", "lang")
    },

    // token-window document chunking (the embedding/RAG prep step: split
    // long docs into overlapping fixed-token windows) — chunk 64, stride
    // 48: starts explode from a sequence, each chunk is an array slice of
    // the ONE materialized token array. Pure map + explode, no shuffle
    // until the output sort
    "tx_chunk_docs" -> { (s, d) =>
      val stride = 48
      Tables.documents(s, d)
        .select(col("doc_id"), TextOps.whitespaceTokens(col("text")).as("w"))
        .where(size(col("w")) > 0)
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(0), size(col("w")) - 1, lit(stride))).as("start"))
        .select(col("doc_id"),
          (col("start") / stride).cast("int").as("chunk_idx"),
          slice(col("w"), col("start") + 1, lit(64)).as("c"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("c")).as("n_chunk_tokens"),
          array_join(col("c"), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // int8 embedding quantization (the vector-store prep step: 4x storage
    // cut before ANN indexing at 100 TB): per-vector max-abs scale,
    // symmetric round-half-up to [-127, 127]. One map pass; exact IEEE
    // arithmetic both engines (float->double casts exact, max is
    // order-free, (x*127)/m left-assoc) so the full q vector hash-matches
    "ann_quantize_int8" -> { (s, d) =>
      val m = array_max(transform(col("embedding"), v => abs(v.cast("double"))))
      val q = transform(col("embedding"),
        v => floor(v.cast("double") * lit(127.0) / col("m") + lit(0.5)).cast("int"))
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), m.as("m"))
        .select(col("vec_id"),
          floor(col("m") / lit(127.0) * lit(1000000000.0) + lit(0.5))
            .cast("long").as("scale_e9"),
          when(col("m") === 0.0,
            array_join(transform(col("embedding"), _ => lit("0")), ","))
            .otherwise(array_join(transform(q, _.cast("string")), ","))
            .as("q_csv"))
        .orderBy("vec_id")
    },

    // lexical retrieval, part 1: per-term df/cf for the fixed benchmark
    // query — ONE aggregate pass over the corpus (per-term tf is an array
    // filter in the scan stage, the shuffle carries a single partial-agg
    // row), stacked to a (term, df, cf) row per term. This is the
    // independently-oracled INPUT to ir_bm25_topk's idf literals
    "ir_term_stats" -> { (s, d) =>
      val toks = TextOps.whitespaceTokens(col("text"))
      def tf(t: String) = size(filter(toks, x => x === lit(t)))
      val aggs = Retrieval.QueryTerms.flatMap { t =>
        Seq(sum(when(tf(t) > 0, 1L).otherwise(0L)).as(s"df_$t"),
          sum(tf(t).cast("long")).as(s"cf_$t"))
      }
      val stackArgs = Retrieval.QueryTerms
        .map(t => s"'$t', df_$t, cf_$t").mkString(", ")
      Tables.documents(s, d)
        .agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${Retrieval.QueryTerms.length}, $stackArgs) " +
          "as (term, df, cf)"))
        .orderBy("term")
    },

    // lexical retrieval, part 2: BM25 top-20 for the fixed query — no
    // inverted index, the score is a pure per-document map (tf array
    // filters + broadcast scalars) feeding TakeOrdered(20). The three idf
    // values are driver-computed (StrictMath.log — ln is the one libm-
    // variant op in BM25) and embedded as literals in BOTH engines; df/N/
    // avgdl derivations and the whole saturation arithmetic are
    // DuckDB-verified (see Retrieval scaladoc)
    "ir_bm25_topk" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val stats = Retrieval.termStats(docs, "text")
      val idfs = stats.perTerm.map { case (t, df, _) =>
        (t, Retrieval.idf(stats.n, df)) }
      val avgdl = Retrieval.avgdlOf(stats)
      bm25State.set((idfs, avgdl))
      Retrieval.bm25TopK(docs, "doc_id", "text", idfs, avgdl, k = 20)
    },

    // lexical retrieval, part 3: the INDEXED shape for a query BATCH —
    // posting rows materialize once for the union of query terms (slim
    // fixed-width exchange), broadcast (query, term, idf) dim join,
    // e9-fixed-point score parts so the distributed per-(query, doc) sum
    // is exact integer arithmetic, BoundedTopK per query (no Window
    // funnel). Contrast ir_bm25_topk's index-free single-query map
    "ir_batch_bm25" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val allTerms = Retrieval.QueryBatch.flatMap(_._2).distinct.sorted
      // TWO jobs total: the stats pass computes df/cf off the posting
      // aggregate with the corpus scalars riding the same scan as an
      // Observation (no separate corpus-agg job), and the scoring pass
      // rebuilds the slim posting frame inline — nothing persisted, so
      // the 99-gate Verify run holds no cache across queries
      val stats = Retrieval.observedStats(docs, "doc_id", "text", allTerms)
      val idfs = stats.perTerm.map { case (t, df, _) =>
        (t, Retrieval.idf(stats.n, df)) }
      val avgdl = Retrieval.avgdlOf(stats)
      batchBm25State.set((idfs, avgdl))
      Retrieval.batchBm25TopK(docs, "doc_id", "text",
        Retrieval.QueryBatch, idfs, avgdl, k = 10)
    },

    // TRAINED quality filter (the fastText-style classifier step; the
    // heuristic tx_quality_score is its weak-label teacher): logistic
    // regression fits driver-side on a deterministic bounded sample
    // (limit-in-plan, the IVF-training discipline), then the full corpus
    // is scored by one codegen projection — literal weights, exact IEEE
    // feature arithmetic, no exp/ln in the output, so DuckDB re-derives
    // the logit bit-identically from the embedded coefficients
    "tx_quality_classifier" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val w = QualityClassifier.train(docs, "text")
      classifierWeights.set(w)
      docs.select(col("doc_id"),
          QualityClassifier.logitColumn(col("text"), w).as("logit"))
        .select(col("doc_id"),
          floor(col("logit") * lit(1000000.0) + lit(0.5)).cast("long")
            .as("logit_e6"),
          when(col("logit") >= 0.0, 1).otherwise(0).as("pred"))
        .orderBy("doc_id")
    },

    // corpus-level heavy hitters: the 20 most frequent token bigrams —
    // native codegen per-doc bigram pass (r11 `TokenNgrams`; Catalyst HOFs
    // evaluate interpreted per element, measured 10× slower here), then
    // partial (map-side) aggregation and a 20-row TakeOrdered; the shuffle
    // carries one row per distinct bigram, never per token
    "tx_top_ngrams" -> { (s, d) =>
      import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
      def bigrams(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        colOf(graft.functions.TokenNgrams(expression(text), 2))
      Tables.documents(s, d)
        .select(explode(bigrams(col("text"))).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(20)
    },

    // LEAKAGE-SAFE split (the eval-contamination guard sm_hash_split
    // lacks): near-duplicate docs must never straddle train/test, so the
    // split unit is the doc's near-dup COMPONENT (digest-collapsed
    // jaccardComponents), falling back to the doc itself for singletons —
    // hashing the component id sends whole duplicate clusters to one
    // split. The components path is the linear-input r10 machinery, so
    // this stays 100-TB-shaped end to end.
    "sm_split_leakage_safe" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val comp = Dedup.jaccardComponents(
        Dedup.hashedShingleDocs(docs, "doc_id", "text"), 0.5)
      docs.select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left_outer")
        .withColumn("unit", coalesce(col("component"), col("doc_id")))
        .select(col("doc_id"), col("unit"),
          Sampling.hashSplit(col("unit")).as("split"))
        .orderBy("doc_id")
    },

    // deterministic hash-based train/validation/test assignment — split
    // membership is a pure function of doc_id (reproducible, stable
    // under corpus growth, zero shuffle)
    "sm_hash_split" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          Sampling.hashBucket(col("doc_id"), 100).cast("int").as("bucket"),
          Sampling.hashSplit(col("doc_id")).as("split"))
        .orderBy("doc_id")
    },

    // deterministic corpus SHUFFLE — every training run randomizes document
    // order before packing; hash order makes it reproducible and
    // engine-portable, and GlobalOrder's two-phase numbering (range
    // partition + per-partition offsets) avoids the single-partition
    // window a naive global row_number would funnel 100 TB through
    "sm_shuffle" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("hkey",
          pmod(col("doc_id") * lit(2654435761L), lit(1000000007L)))
      graft.ops.GlobalOrder.withRowNumber(docs, "shuffle_pos", col("hkey"), col("doc_id"))
        .select(col("doc_id"), col("shuffle_pos"))
        .orderBy("doc_id")
    },

    // CURRICULUM training order: high-quality buckets first, deterministic
    // hash-decorrelation WITHIN each bucket (adjacent corpus ids must not
    // train adjacently), one global position per doc. Buckets come from
    // the quality VALUE (the e4 integer form, so the boundary is exact in
    // both engines), NOT an NTILE — a value bucket needs no global sort,
    // while NTILE over a global ORDER BY funnels 100 TB through one
    // partition; the position itself rides GlobalOrder's two-phase
    // numbering (range partition + per-partition offsets)
    "sm_curriculum" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"),
        TextOps.qualityScore(col("text"), qualityStopwords).as("quality"))
      val e4 = floor(col("quality") * 10000.0 + 0.5)
      val bucketed = docs
        .withColumn("bucket", least(floor(e4 / 1000.0), lit(9.0)).cast("int"))
        .withColumn("hkey",
          pmod(col("doc_id") * lit(2654435761L), lit(1000000007L)))
      graft.ops.GlobalOrder.withRowNumber(bucketed, "curriculum_pos",
        col("bucket").desc, col("hkey"), col("doc_id"))
        .select(col("doc_id"), col("bucket"), col("quality"),
          col("curriculum_pos"))
        .orderBy("doc_id")
    },

    // token-BUDGET curation: keep the highest-quality documents until the
    // token budget is exhausted (the "fill the training mix" selection).
    // Distributed via the two-phase prefix sum over (quality desc, id) —
    // no single-partition window
    "cur_token_budget" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        size(TextOps.whitespaceTokens(col("text"))).cast("long").as("n_tokens"),
        TextOps.qualityScore(col("text"), qualityStopwords).as("quality"))
      graft.ops.PrefixSum.withRunningTotal(docs, "n_tokens", "cum_tokens",
        col("quality").desc, col("doc_id"))
        .where(col("cum_tokens") <= 20000L)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("quality"), col("cum_tokens"))
        .orderBy("doc_id")
    },

    // per-language token-count distribution (the corpus-stats report a
    // curation run starts from): exact interpolated quartiles + mean.
    // percentile() is a sort-based exact aggregate — per-group state is
    // the group's values, fine for per-LANGUAGE groups (bounded
    // cardinality); for per-document groupings use approx_percentile
    "tx_length_quantiles" -> { (s, d) =>
      val n = size(TextOps.whitespaceTokens(col("text"))).cast("double")
      def q4(c: org.apache.spark.sql.Column) = floor(c * 10000.0 + 0.5) / 10000.0
      Tables.documents(s, d)
        .select(col("lang"), n.as("n"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          q4(percentile(col("n"), lit(0.25))).as("p25"),
          q4(percentile(col("n"), lit(0.5))).as("p50"),
          q4(percentile(col("n"), lit(0.75))).as("p75"),
          q4(avg(col("n"))).as("mean_tokens"))
        .orderBy("lang")
    },

    // the SKETCH path next to the exact tx_length_quantiles: approximate
    // percentiles via percentile_approx (Greenwald-Khanna style summary) —
    // per-group state is a BOUNDED mergeable sketch, not the group's full
    // value buffer, so this is the form that survives high-cardinality
    // groupings (per-source/per-shard stats at 100 TB) where the exact
    // sort-based percentile's state grows with the group. Oracle: the
    // sketch outputs ride the oracle SQL as literals (the embedded-
    // centroid pattern) and DuckDB INDEPENDENTLY verifies, from the raw
    // corpus, that each value is an observed group member whose rank
    // interval intersects the documented ε = 1/accuracy rank window —
    // echoing the literal on pass, NULL (hash mismatch) on violation.
    // TextOpsSpec additionally pins the same bound Spark-side.
    "tx_quantiles_sketch" -> { (s, d) =>
      val n = size(TextOps.whitespaceTokens(col("text"))).cast("double")
      val agg = Tables.documents(s, d)
        .select(col("lang"), n.as("n"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          percentile_approx(col("n"), array(lit(0.25), lit(0.5), lit(0.75)),
            lit(10000)).as("qs"))
        .select(col("lang"), col("n_docs"),
          element_at(col("qs"), 1).as("p25"),
          element_at(col("qs"), 2).as("p50"),
          element_at(col("qs"), 3).as("p75"))
        .orderBy("lang")
      // per-lang rows: bounded by language cardinality, never the corpus.
      // Collected ONCE — the oracle builder needs the values as literals,
      // and returning the distributed frame would re-run the whole
      // aggregation when the caller materializes it (a 2× bench bias); the
      // caller gets a local relation with the aggregate's exact schema
      val rows = agg.collect()
      quantileSketchState.set(rows.map(r =>
        (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.toSeq.asJava, agg.schema)
    },

    // per-language deterministic downsampling — the "rebalance the corpus"
    // step (cap the dominant language, keep the rest): membership is a pure
    // function of (doc_id, lang), zero shuffle, stable under corpus growth
    "sm_stratified" -> { (s, d) =>
      val rate = when(col("lang") === "en", 20).otherwise(60)
      Tables.documents(s, d)
        .where(Sampling.hashBucket(col("doc_id"), 100) < rate)
        .select(col("doc_id"), col("lang"),
          Sampling.hashBucket(col("doc_id"), 100).cast("int").as("bucket"))
        .orderBy("doc_id")
    },

    // temperature-scaled source mixing (the XLM-R/mT5 multilingual recipe,
    // alpha = 0.5): per-source keep-rate ∝ n_s^(alpha-1), normalized so the
    // expected sample is total/4 docs — small sources are upsampled
    // relative to proportional, large ones damped, rate clamped at 1.
    // Determinism across engines: counts are exact ints; the normalizer
    // folds sqrt(n_s) in ASCENDING SORTED order (sort_array + HOF
    // aggregate ↔ list_sort + list_reduce — same IEEE fold both sides);
    // the per-source rate becomes an integer ppm threshold, so doc
    // membership is an exact integer hash compare (sm_stratified's rule).
    // Scale shape: two tiny source-cardinality dims (broadcast), the
    // corpus is one scan + map-side filter — no corpus shuffle at all.
    "sm_temperature" -> { (s, d) => temperatureSample(Tables.documents(s, d)) },

    // explicit-weight domain mixture (the DoReMi/Pile config shape) —
    // see mixtureSample; distinct from sm_temperature (weights are a
    // decision, not a count statistic) and sm_source_cap (a ceiling,
    // not a target allocation)
    "sm_mixture" -> { (s, d) => mixtureSample(Tables.documents(s, d)) },

    // the UPSAMPLING form of sm_temperature (epochs, the full XLM-R
    // recipe): budget = the corpus size, so small sources resample at
    // rate > 1 — each doc emits floor(rate) whole copies plus one more
    // when its hash lands under the fractional remainder. All arithmetic
    // after the single rate double collapses to ppm integers (rate1e6),
    // so copy counts are exact on both engines; the output is the
    // actually-materialized repetition stream (doc_id, copy).
    "sm_temperature_epochs" -> { (s, d) => temperatureEpochs(Tables.documents(s, d)) },

    // corpus-trained bigram-LM perplexity scoring (the CCNet quality
    // signal, self-trained): add-one-smoothed p(w2|w1) from exact corpus
    // counts, per-doc mean negative log-likelihood. Cross-engine float
    // discipline (the mm_ integer-arithmetic rule): each -ln(p) rounds
    // ONCE to a 1e-4 fixed-point BIGINT, so every downstream sum is exact
    // integer arithmetic — no float fold-order dependence anywhere.
    // Scale shape: the LM "training" is two partial-agg count passes; the
    // count tables are vocab-sized dims (broadcast for scoring — at web
    // scale they'd bucket-join instead), the final agg keys on doc_id.
    "tx_perplexity" -> { (s, d) =>
      import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
      def bigrams(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        colOf(graft.functions.TokenNgrams(expression(text), 2))
      val docs = Tables.documents(s, d)
      val uni = docs.select(explode(TextOps.whitespaceTokens(col("text"))).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("c1"))
      // r19 (guide §2.4): v = vocab size computed so that `c1` survives
      // column pruning — count(*) (and count(c1), which NullPropagation
      // rewrites back to count(*) since c1 is non-nullable) pruned c1 from
      // the subtree, de-canonicalizing its shuffle from uni's, and the
      // corpus was scanned+tokenized+aggregated a second time just for
      // the vocab count (plan evidence: plans/r19/tx_perplexity_before.txt,
      // the keys=[w1], functions=[] branch). count(when(c1 > -1, c1)) is
      // the same value (c1 is a count, always > -1) but opaque to the
      // rewrite, so ReuseExchange serves uni's shuffle to both consumers.
      val vDf = uni.agg(count(when(col("c1") > -1, col("c1"))).as("v"))
      val bi = docs.select(col("doc_id"), explode(bigrams(col("text"))).as("b"))
      val bc = bi.groupBy("b").agg(count(lit(1)).as("c12"))
      bi
        .join(broadcast(bc), Seq("b"))
        .withColumn("w1", substring_index(col("b"), " ", 1))
        .join(broadcast(uni), Seq("w1"))
        .crossJoin(broadcast(vDf))
        .withColumn("t", floor(-log((col("c12") + 1).cast("double") /
          (col("c1") + col("v")).cast("double")) * 10000.0 + 0.5).cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("t").as("nll_sum_e4"))
        .select(col("doc_id"), col("n_bigrams"),
          floor(col("nll_sum_e4").cast("double") / col("n_bigrams").cast("double"))
            .cast("long").as("avg_nll_e4"))
        .orderBy("doc_id")
    },

    // per-source caps (the web-pipeline "at most N docs per domain" rule):
    // rank within source by doc_id, keep the first N — the window is
    // PARTITIONED by source, so it scales with the source cardinality
    "sm_source_cap" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 40)
        .select(col("doc_id"), col("source"), col("rn"))
        .orderBy("doc_id")
    },

    // greedy contiguous context-window packing: running token total in
    // doc_id order (distributed two-phase prefix sum — ops.PrefixSum, NOT
    // an unpartitioned window), then pack_id = tokens-before / contextLen
    "sm_pack" -> { (s, d) =>
      val perDoc = Tables.documents(s, d).select(
        col("doc_id"),
        size(TextOps.whitespaceTokens(col("text"))).cast("long").as("n_tokens"))
      graft.ops.PrefixSum.withRunningTotal(perDoc, "n_tokens", "running", col("doc_id"))
        .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
          col("running"),
          floor((col("running") - col("n_tokens")) / 2048.0).cast("long").as("pack_id"))
        .orderBy("doc_id")
    },

    // tokenizer-AWARE packing: sm_pack with the learned-BPE token counts a
    // real pretraining pipeline packs by (whitespace counts misprice docs
    // whose words split into many subwords). Same distributed two-phase
    // prefix sum; the per-doc count is one native-kernel map. Oracle: the
    // reference-encoded word→count dim as literals + a SQL running sum —
    // so the composition (tokenize → count → pack) is verified end to end
    "sm_pack_bpe" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val trained = Bpe.train(docs, "text", numMerges = 24)
      bpeTrained.set(trained)
      val perDoc = docs.select(col("doc_id"),
        size(Bpe.encodeTokens(col("text"), trained.merges)).cast("long")
          .as("n_bpe"))
      graft.ops.PrefixSum.withRunningTotal(perDoc, "n_bpe", "running", col("doc_id"))
        .select(col("doc_id"), col("n_bpe").cast("int").as("n_bpe"),
          col("running"),
          floor((col("running") - col("n_bpe")) / 2048.0).cast("long").as("pack_id"))
        .orderBy("doc_id")
    },

    // the curation pipeline end-to-end: quality gate -> normalized dedup
    // (keep each cluster's min-id doc) -> survivors with their stats. One
    // corpus scan, one groupBy on the canonical text, one hash join back
    // on doc_id — every stage keyed, nothing driver-side
    "cur_corpus" -> { (s, d) => curateCorpus(s, d, 0.4) },

    // semantic curation across BOTH corpus tables: quality-gate the docs,
    // then drop embedding-cosine near-dups among the survivors (keep each
    // pair's min id). documents⋈embeddings is a keyed semi-join; the
    // near-dup pairs ride the tiled block cosine join; the drop-list is
    // the duplicates — by construction the broadcastable small side
    "cur_semantic" -> { (s, d) => curateSemantic(s, d, 0.4) },

    // r15: the SCALE path for the same curation relation — the semantic
    // near-dup drop rides the IVF-bucketed pair sweep (Σ c² work, exact
    // verify inline) instead of the brute triangle; full hash oracle via
    // the embedded-centroid trick (the oracle replicates the candidate
    // rule, so equality is exact regardless of the bucketing's recall)
    "cur_semantic_ivf" -> { (s, d) => curateSemanticIvf(s, d, 0.4) },

    // r15: the decision productized (the dd_canonical_auto shape) — one
    // kept-embedding count picks brute vs bucketed; below the cutover at
    // every gate SF, so the gate checks the exact branch against the
    // cur_semantic oracle and CurationSamplingSpec forces both branches
    "cur_semantic_auto" -> { (s, d) => curateSemanticAuto(s, d, 0.4) },

    // ---- deduplication -------------------------------------------------

    "dd_ngram_jaccard" -> { (s, d) =>
      Dedup.pairTable(Tables.documents(s, d), "doc_id", "text", 0.5)
    },

    // the boilerplate-scale production path in the gate (r10): PPJoin
    // prefix + size + positional filters with shingles ordered by
    // ascending DOCUMENT FREQUENCY, so corpus-wide-common shingles never
    // enter a prefix and the Σc² candidate blowup of the inverted index
    // disappears. Identical output to dd_ngram_jaccard (the prefix lemma
    // holds under any fixed total order) — same full-hash oracle.
    "dd_ppjoin" -> { (s, d) =>
      Dedup.jaccardPairsPrefixDf(
        Dedup.hashedShingleDocs(Tables.documents(s, d), "doc_id", "text"), 0.5)
    },

    "dd_minhash_lsh" -> { (s, d) =>
      Dedup.minhashLshPairs(
        Dedup.shingleDocs(Tables.documents(s, d), "doc_id", "text"), 0.5)
    },

    "dd_simhash" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        Dedup.simhash(col("text")).as("simhash"))
        .orderBy("doc_id")
    },

    // normalized-text dedup: casing/punctuation/whitespace-insensitive
    // exact dedup — normalize is scan-stage compute, then one groupBy on
    // the canonical form (same scale shape as j7's exact dedup)
    // normalized exact dedup groups by a 96-bit CONTENT DIGEST (+ length)
    // computed map-side, not by the normalized text itself: grouping by
    // the string shuffles the whole corpus body (the r10 exchange audit
    // caught exactly that), while the digest exchange is four fixed-width
    // columns per doc. Identical output to text-keyed grouping (the
    // oracle's form) absent a same-length 96-bit double collision —
    // P ≈ n²/2^97, immaterial at any corpus size this engine targets.
    "dd_normalized" -> { (s, d) =>
      val norm = TextOps.normalizeText(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), xxhash64(norm).as("h64"), hash(norm).as("h32"),
          length(norm).as("norm_len"))
        .groupBy("h64", "h32", "norm_len")
        .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_dups"))
        .select("rep_doc_id", "n_dups", "norm_len")
        .orderBy("rep_doc_id")
    },

    "dd_cosine_neardup" -> { (s, d) =>
      Ann.cosinePairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
    },

    // r14: the SCALE path for the same relation — IVF-bucketed candidate
    // pairs (top-2 cell multi-assignment, work Σ c² instead of n²) with
    // the brute tier's exact verify. Deterministic quantizer -> the
    // oracle embeds the centroids and replicates the full candidate
    // rule, so the hash gate is exact regardless of recall; recall vs
    // dd_cosine_neardup is spec-floored (AnnIvfPairsSpec).
    "dd_cosine_neardup_ivf" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = Ann.trainIvfCentroids(emb, "vec_id", "embedding",
        numCells = 16, lloydIters = 2, trainCap = 4096)
      ivfPairCents.set(cents)
      Ann.cosinePairsIvfWithCentroids(emb, "vec_id", "embedding", 0.4,
        nProbe = 2, cents)
    },

    // r15: the daily-ingest shape on the embedding modality — exactly the
    // bucketed pairs that TOUCH a new-batch vector (vec_id >= 400, the
    // dd_incremental convention), old×old never generated (yesterday's
    // materialized pair table holds those). Same embedded-centroid oracle
    // with the touching-new predicate on the candidate rule
    "dd_cosine_neardup_inc" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = Ann.trainIvfCentroids(emb, "vec_id", "embedding",
        numCells = 16, lloydIters = 2, trainCap = 4096)
      ivfIncCents.set(cents)
      Ann.cosinePairsIvfIncrementalWithCentroids(emb, "vec_id", "embedding",
        col("vec_id") >= 400, 0.4, nProbe = 2, cents)
    },

    "dd_hamming" -> { (s, d) =>
      Dedup.simhashPairs(
        Tables.documents(s, d).select(
          col("doc_id"), Dedup.simhash(col("text")).as("simhash")),
        maxHamming = 3)
    },

    // benchmark decontamination — the "remove training docs that leak
    // eval-benchmark n-grams" pipeline stage: docs sharing ANY 3-token
    // shingle with the benchmark set (here: doc_id < 20) are dropped.
    // Scale shape: the benchmark's shingle set is SMALL by construction →
    // broadcast semi-join (a map-side membership filter over one corpus
    // scan); the contaminated id list is the small side of the final
    // anti-join for the same reason. No corpus-vs-corpus join anywhere.
    "cur_decontaminate" -> { (s, d) =>
      decontaminateSurvivors(s, d, benchBelow = 20, useBloom = false)
    },

    // the SCALE path of cur_decontaminate: same semantics, but the
    // benchmark-shingle membership test is a broadcast BLOOM FILTER probe
    // (native codegen expression, scan-stage) instead of a broadcast hash
    // relation — the shape that survives when the eval suite's shingle set
    // outgrows a broadcast-hash join (~10⁸-10⁹ shingles broadcast as
    // ~1.2 GB of bits, not ~10s of GB of hash table). Bloom false
    // positives are killed by an exact semi-join over ONLY the candidate
    // survivors (deliberately NOT broadcast: at the scale where bloom
    // matters the bench set no longer broadcasts as a relation), so the
    // output — and the oracle — are identical to cur_decontaminate.
    "cur_decontaminate_bloom" -> { (s, d) =>
      decontaminateSurvivors(s, d, benchBelow = 20, useBloom = true)
    },

    // PII detection (the C4/Dolma/FineWeb curation stage): per-kind match
    // counts over deterministically PII-injected text (the mm_ payload
    // pattern — the synthetic corpus carries no PII, so the query plants
    // emails/phones/IPv4s keyed on doc_id and the oracle replicates the
    // injection exactly). Scan-stage compute: regexp_count is codegen'd,
    // no UDF, no shuffle until the final sort.
    "cur_pii_stats" -> { (s, d) =>
      piiInjectedDocs(Tables.documents(s, d))
        .select(col("doc_id"), TextOps.piiCounts(col("text")).as("p"))
        .select(col("doc_id"),
          col("p.n_email").as("n_email"), col("p.n_phone").as("n_phone"),
          col("p.n_ip").as("n_ip"),
          (col("p.n_email") + col("p.n_phone") + col("p.n_ip") > 0).as("has_pii"))
        .orderBy("doc_id")
    },

    // the ACTION form: redact every PII match with a typed placeholder
    // (email → phone → IP, the order TextOps.piiRedact fixes) and pin the
    // cleaned text by its polynomial fingerprint — same evidence shape as
    // cur_dedup_spans' span surgery.
    "cur_pii_redact" -> { (s, d) =>
      // ONE fused kernel pass (r12): counts on raw + ordered redaction +
      // inline length/fingerprint — replaces six separate regexp ops that
      // each re-decoded the string (TextOpsSpec pins kernel == spec)
      piiInjectedDocs(Tables.documents(s, d))
        .select(col("doc_id"), TextOps.piiRedactStats(col("text")).as("r"))
        .select(col("doc_id"),
          col("r.n_redacted").as("n_redacted"),
          col("r.clean_len").as("clean_len"),
          col("r.clean_fp").as("clean_fp"))
        .orderBy("doc_id")
    },

    // substring-level dedup signal: per doc, how many of its 20-token
    // stride-1 windows also appear in ANOTHER doc (cross-doc only —
    // within-doc repeats are tx_repetition's job). The window hash is a
    // true rolling hash, so scan-stage work is O(chars); the hot-window
    // set rides one (hash)-keyed shuffle — posting-list shape, window
    // payload is a single long
    "dd_dup_windows" -> { (s, d) =>
      // the MEMOIZED posting seam (one windowHashes pass), shared with
      // cur_dedup_spans — docs under 20 tokens emit no postings, so the
      // unfiltered source yields identical rows for both queries
      val wins = TextOps.windowPostings(Tables.documents(s, d), "doc_id", "text", 20)
        .select("doc_id", "h")
      val hot = wins.groupBy("h").agg(countDistinct("doc_id").as("dc"))
        .where(col("dc") >= 2).select("h")
      val perDoc = wins.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
      val dupPer = wins.join(hot, Seq("h"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
      perDoc.join(dupPer, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_windows"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          (floor(coalesce(col("n_dup"), lit(0L)) / col("n_windows") * 1000000.0
            + 0.5) / 1000000.0).as("dup_frac"))
        .orderBy("doc_id")
    },

    // the ACTION form of dd_dup_windows: REWRITE each doc with every
    // token covered by a cross-doc duplicated 20-token window removed
    // (the "cut duplicated spans out of training text" surgery). The
    // cleaned text is pinned by its polynomial fingerprint rather than
    // shipped as a column — the oracle reconstructs the same string.
    // Scale shape: window postings shuffle once on the hash; the per-doc
    // hot-index lists ride a keyed aggregation; the surgery itself is
    // scan-stage compute
    "cur_dedup_spans" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .where(size(TextOps.whitespaceTokens(col("text"))) >= 20)
      // SAME memo key as dd_dup_windows (unfiltered source): short docs
      // emit no postings, so the rows are identical and the two queries
      // genuinely share one materialized posting table
      val wins = TextOps.windowPostings(Tables.documents(s, d), "doc_id", "text", 20)
      val hot = wins.groupBy("h").agg(countDistinct("doc_id").as("dc"))
        .where(col("dc") >= 2).select("h")
      val hotIdx = wins.join(hot, Seq("h"), "left_semi")
        .groupBy("doc_id").agg(collect_list("i").as("hot_is"))
      // native codegen surgery kernel (r11): null hot_is = the left-outer
      // miss side = nothing removed — see SpanSurgery's null semantics
      import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
      def surgery(text: org.apache.spark.sql.Column, hotIs: org.apache.spark.sql.Column) =
        colOf(graft.functions.SpanSurgery(expression(text), expression(hotIs), 20))
      docs.join(hotIdx, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), surgery(col("text"), col("hot_is")).as("r"))
        .select(col("doc_id"), col("r._1").as("n_tokens"),
          col("r._2").as("n_removed"), col("r._3").as("clean_fp"))
        .orderBy("doc_id")
    },

    // source-SCOPED boilerplate stripping (r14; the CCNet/RefinedWeb
    // curation rule): a segment shared by >= 2 docs OF THE SAME SOURCE is
    // crawl chrome and is dropped from every doc carrying it. Distinct
    // from cur_dedup_spans (corpus-global, stride-1 windows, any repeat):
    // this is the per-source frequency rule at fixed segment granularity
    // with a threshold knob (minFrac is the production surface; the gate
    // pins minDocs=2 because the synthetic corpus tops out at 2-doc
    // sharing — non-vacuous at both gate SFs: the planted mutated-copy
    // pairs share exact chunks inside at least one source each).
    "cur_boilerplate" -> { (s, d) =>
      TextOps.stripBoilerplate(Tables.documents(s, d)).orderBy("doc_id")
    },

    // the REPORTING form of the span family: VARIABLE-LENGTH maximal
    // duplicated spans (the Lee-et-al "deduplicating training data"
    // surface) — overlapping/adjacent cross-doc 20-token hot windows merge
    // into maximal token ranges via gaps-and-islands (same-length windows
    // merge iff start gap <= window size). Third consumer of the memoized
    // posting seam; the span algebra is one doc-keyed window pass.
    "dd_maximal_spans" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wins = TextOps.windowPostings(Tables.documents(s, d), "doc_id", "text", 20)
      val hot = wins.groupBy("h").agg(countDistinct("doc_id").as("dc"))
        .where(col("dc") >= 2).select("h")
      val hotWins = wins.join(hot, Seq("h"), "left_semi").select("doc_id", "i")
      val w = Window.partitionBy("doc_id").orderBy("i")
      hotWins
        .withColumn("brk", when(col("i") - lag("i", 1).over(w) > 20, 1).otherwise(0))
        .withColumn("g", sum("brk").over(w))
        .groupBy("doc_id", "g")
        .agg(min("i").as("span_start"), (max("i") + 19).as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + 1).as("span_tokens"))
        .orderBy("doc_id", "span_start")
    },

    // incremental ingest dedup: the pairs a NEW batch (doc_id >= 400)
    // forms with anything — old×old never generated (yesterday's pair
    // table already has it); the steady-state daily-ingest shape
    "dd_incremental" -> { (s, d) =>
      Dedup.jaccardPairsIncremental(
        Dedup.hashedShingleDocs(Tables.documents(s, d), "doc_id", "text"),
        col("doc_id") >= 400, 0.5)
    },

    // pair-table COMPACTION loop: yesterday's MATERIALIZED old×old pair
    // table (Parquet) ∪ today's incremental new-touching pairs (old×old
    // never regenerated) — the oracle is the FROM-SCRATCH pair SQL over
    // the full corpus, so the gate hash-verifies that the daily loop
    // converges to exactly the recompute. Batch split matches
    // dd_incremental (new = doc_id >= 400).
    "dd_compaction" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val path = java.nio.file.Files.createTempDirectory("graft_compact")
        .resolve("old_pairs").toString
      val oldPairs = Dedup.materializePairTable(
        docs.where(col("doc_id") < 400), "doc_id", "text", 0.5, path)
      Dedup.compactPairTable(
        Dedup.hashedShingleDocs(docs, "doc_id", "text"),
        col("doc_id") >= 400, oldPairs, 0.5)
    },

    // both component queries consume the MEMOIZED pair stage
    // (Dedup.pairTable) — in a staged pipeline the pair table is
    // materialized once and shared, not recomputed per consumer
    "dd_components" -> { (s, d) =>
      Dedup.connectedComponents(
        Dedup.pairTable(Tables.documents(s, d), "doc_id", "text", 0.5))
    },

    // the Jaccard twin of dd_sim_components (r10): exact-duplicate
    // classes collapse to one representative BEFORE pair generation, so
    // a boilerplate class of m identical docs costs m star edges instead
    // of C(m,2) j=1.0 pairs. Same output, same recursive-CTE oracle as
    // dd_components.
    "dd_jac_components" -> { (s, d) =>
      Dedup.jaccardComponents(
        Dedup.hashedShingleDocs(Tables.documents(s, d), "doc_id", "text"), 0.5)
    },

    // r13: components through the ROUTED edge relation (digest-collapse
    // stars + banding-candidate rep pairs, exact-verified) — the same
    // stages as dd_canonical_routed, gated against dd_components' oracle
    "dd_components_routed" -> { (s, d) =>
      Dedup.componentsRouted(Tables.documents(s, d), "doc_id", "text", 0.5)
    },

    // r14: the auto decision on the components relation (same routeStats
    // rule as dd_canonical_auto, same oracle as dd_components)
    "dd_components_auto" -> { (s, d) =>
      Dedup.componentsAuto(Tables.documents(s, d), "doc_id", "text", 0.5)
    },

    // duplicate clusters straight from the simhash banding WITHOUT the
    // quadratic all-pairs relation (r10): star edges to per-signature
    // representatives + sig-level qualifying edges — linear input to
    // components regardless of duplicate-class sizes. Oracle = recursive
    // CTE over the brute-force hamming pair join (dd_hamming's arithmetic).
    "dd_sim_components" -> { (s, d) =>
      Dedup.simhashComponents(
        Tables.documents(s, d).select(
          col("doc_id"), Dedup.simhash(col("text")).as("simhash")),
        maxHamming = 3)
    },

    // the end-to-end dedup a training pipeline actually runs: near-dup
    // pairs -> components -> keep only each cluster's min-id doc (plus
    // all never-duplicated docs). A broadcastable drop-list anti-join:
    // the non-canonical ids are BY CONSTRUCTION the small side (they are
    // the duplicates), so at 100 TB this is corpus-scan + broadcast.
    "dd_canonical" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val comps = Dedup.connectedComponents(
        Dedup.pairTable(docs, "doc_id", "text", 0.5))
      val dropList = comps.where(col("doc_id") =!= col("component"))
        .select(col("doc_id"))
      docs.join(broadcast(dropList), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), length(col("text")).as("text_len"))
        .orderBy("doc_id")
    },

    // r13: the productized 100 TB ROUTE for the same canonical-docs
    // output — digest-collapse exact dups, MinHash banding over class
    // reps, exact verify on surviving candidates only
    // (Dedup.canonicalDocsRouted, the executable form of the sf1
    // crossover measurement). Same recursive-CTE oracle as dd_canonical:
    // the bar is literal output equality between the two strategies.
    "dd_canonical_routed" -> { (s, d) =>
      Dedup.canonicalDocsRouted(Tables.documents(s, d), "doc_id", "text", 0.5)
        .select(col("doc_id"), length(col("text")).as("text_len"))
        .orderBy("doc_id")
    },

    // r14: the DECISION productized — one cheap stats pass (count + HLL
    // dup ratio, Dedup.routeStats) picks exact vs routed by the measured
    // sf1 crossover rule. Same oracle as dd_canonical: whichever tier the
    // stats select must produce the identical relation.
    "dd_canonical_auto" -> { (s, d) =>
      Dedup.canonicalDocsAuto(Tables.documents(s, d), "doc_id", "text", 0.5)
        .select(col("doc_id"), length(col("text")).as("text_len"))
        .orderBy("doc_id")
    },

    // ---- similarity search ----------------------------------------------

    "ann_cosine_topk" -> { (s, d) =>
      Ann.cosineTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") < 20, k = 5)
    },

    // LSH has a FULL hash oracle: its hyperplanes are data-independent and
    // deterministic, so the oracle SQL embeds the exact plane matrix as
    // literals (same fold order, same sign test — see `lshPlanesValues`)
    // the gate PINS the pedagogical 8-bit × 8-table config (the oracle
    // embeds exactly this plane matrix); the library's shipped default is
    // the r15-measured 4×16 preset — see Ann.lshTopK's scaladoc
    "ann_lsh_topk" -> { (s, d) =>
      Ann.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") < 20, k = 5, dim = 64, numPlanes = 8, tables = 8)
    },

    // multi-probe LSH (query-side 1-bit-flip probes over the SAME corpus
    // index): candidate rule is hamming(sig_q, sig_n) <= 1 per table, a
    // strict superset of ann_lsh_topk's equality rule — recall lift
    // recorded per round in RECALL.json; same literal-plane full oracle
    "ann_lsh_mp_topk" -> { (s, d) =>
      Ann.lshMultiProbeTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") < 20, k = 5, dim = 64, numPlanes = 8, tables = 8,
        probeBits = 1)
    },

    // IVF has a FULL hash oracle despite its DATA-DEPENDENT coarse
    // quantizer: training is deterministic and bounded (hash-ordered
    // sample, id-mod init, ascending-id mean folds — Ann.trainIvfCentroids),
    // so the query trains the matrix driver-side, memoizes it, and the
    // oracle builder (run by Verify AFTER the queries) embeds the exact
    // centroids as DOUBLE[] literals — the ann_lsh hyperplane trick.
    // Assignment, probing, and re-ranking are then verified independently
    // by DuckDB; training determinism itself is spec-asserted.
    "ann_ivf_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = Ann.trainIvfCentroids(emb, "vec_id", "embedding",
        numCells = 16, lloydIters = 2, trainCap = 4096)
      ivfTrainedCentroids.set(cents)
      Ann.ivfTopKWithCentroids(emb, "vec_id", "embedding",
        col("vec_id") < 20, k = 5, nProbe = 4, cents)
    },

    // cluster-BALANCED ("diverse") curation: the top-quality docs PER
    // EMBEDDING CLUSTER — keeps every semantic region represented instead
    // of letting one dominant topic fill the budget. Cells come from the
    // SAME deterministic IVF quantizer as ann_ivf (memoized, so this query
    // also gets a FULL hash oracle via the embedded-centroid CTE);
    // per-cell selection rides the BoundedTopK aggregate — 16 cells means
    // a row_number window would funnel the corpus through 16 partitions,
    // the aggregate combines map-side instead
    "cur_diverse" -> { (s, d) =>
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      // gate config EXPLICIT (AnnGateConfigSpec rule): this previously
      // inherited the trainer defaults; pinned so a shipped-preset move
      // (like r17's ivfTopK 16/8 → 64/32) can never shift this oracle
      val cents = Ann.trainIvfCentroids(emb, "vec_id", "embedding",
        numCells = 16, lloydIters = 2, trainCap = 4096)
      ivfTrainedCentroids.set(cents)
      val cells = Ann.assignCells(emb, "vec_id", "embedding", cents)
        .select(col("id").as("doc_id"), col("cell"))
      val q = Tables.documents(s, d).select(col("doc_id"),
        TextOps.qualityScore(col("text"), qualityStopwords).as("quality"))
      val topK = new graft.ops.BoundedTopK[(Double, Long)](
        20, Ordering.by(t => (-t._1, t._2)), implicitly)
      cells.join(q, Seq("doc_id"))
        .select(col("cell"), col("quality"), col("doc_id"))
        .as[(Int, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3))
        .agg(topK.toColumn.name("top"))
        .flatMap { case (cell, top) =>
          top.map { case (ql, id) => (id, cell, ql) }
        }
        .toDF("doc_id", "cell", "quality")
        .orderBy("doc_id")
    },

    // IVF-PQ has a FULL hash oracle since r14 (verdict ask #3): both
    // quantizer layers train deterministically driver-side, the model is
    // memoized, and the oracle builder embeds centroids AND codebooks as
    // literals — code assignment (per-subspace L2 argmin over the
    // residual), the ADC shortlist (celldot-seeded ordered fold, per-query
    // top cf·k window), and the exact re-rank are then all verified
    // independently by DuckDB. The index stores m one-byte codes per
    // vector — the 32x-compressed layout that keeps a 100 TB embedding
    // corpus's index in executor memory.
    "ann_ivfpq_topk" -> { (s, d) =>
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      // gate trainer config EXPLICIT (AnnGateConfigSpec rule, r18): the
      // shipped ivfPqTopK preset moved to 64/32/m16/ks256/cf64 — the
      // pedagogical artifact the oracle embeds must not move with it
      Ann.trainIvfPq(emb, "vec_id", "embedding", numCells = 16, m = 8,
        ks = 16, lloydIters = 2, trainCap = 4096) match {
        case Some(model) =>
          pqTrainedModel.set(model)
          Ann.ivfPqTopKWithModel(emb, "vec_id", "embedding",
            col("vec_id") < 20, k = 5, nProbe = 4, candidateFactor = 8, model)
        case None => Seq.empty[(Long, Int, Long, Double)]
          .toDF("query_id", "rank", "neighbor_id", "score")
      }
    },

    // hard-negative mining for contrastive/embedding-model training: per
    // query, the top-k corpus vectors in the cosine band [0.2, 0.8) —
    // informative negatives BELOW the near-duplicate band (>= 0.8 is a
    // likely positive and would poison the negative set). The band is
    // non-degenerate on the gate corpus: random-pair cosines sit ~0.2-0.45
    // and the planted duplicates at ~1.0, so both band edges bind.
    "ann_hard_negatives" -> { (s, d) =>
      Ann.hardNegatives(Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") < 20, k = 5, lo = 0.2, hi = 0.8)
    },

    // HNSW has a FULL hash oracle since r14: the deterministic shard
    // graphs (hash levels, ascending-id insertion, lower-id tie-breaks)
    // are a TRAINED ARTIFACT — the oracle builder rebuilds them driver-
    // side (bit-identical by determinism, spec-pinned) and embeds entry
    // points + adjacency as literals, while DuckDB re-derives the SEARCH
    // itself: greedy descent, the ef-bounded beam sweep as a recursive
    // CTE, per-shard top-k, exact re-rank. See [[hnswOracle]].
    "ann_hnsw_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // the dump is ORACLE machinery, not part of the probe — memoized so
      // repeated bench runs time the operator, not the driver-side
      // rebuild. Keyed by a CONTENT fingerprint of the embeddings files
      // (name+size+mtime), not by dir alone: rewriting the data under a
      // dir mid-session refreshes the dump instead of replaying a stale
      // one against a fresh probe (r15 ADVICE).
      hnswModel.set(hnswDumpFor(s, d, emb))
      // gate config EXPLICIT (AnnGateConfigSpec rule): the oracle embeds
      // the shard graphs trained at exactly these values; a default change
      // (e.g. shard count scaled to cores for build parallelism, as the
      // sf10dup envelope does) must never shift this result
      Ann.hnswTopK(emb, "vec_id", "embedding", col("vec_id") < 20, k = 5,
        numShards = 8, m = 8, ef = 64)
    },

    // ROUTED HNSW (r17): the scale path past the 1024-shard fan-out cap —
    // shards are semantic (one per IVF-trained cell, hot cells hash-spread
    // into sub-shards) and each query walks only its nProbeCells nearest
    // cells. FULL hash oracle: centroids AND shard graphs are the trained
    // artifact; DuckDB re-derives routing (the IVF probe rule over
    // centroid literals) plus every search decision. Gate config
    // pedagogical and EXPLICIT (AnnGateConfigSpec): 8 cells / probe 4 /
    // m=8 / ef=64 / 64-row sub-shard target (small enough that sub-
    // sharding actually fires on the 500-row gate corpus).
    "ann_hnsw_routed" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      hnswRoutedModel.set(hnswRoutedDumpFor(s, d, emb))
      Ann.hnswRoutedTopK(emb, "vec_id", "embedding", col("vec_id") < 20,
        k = 5, numCells = 8, nProbeCells = 4, m = 8, ef = 64,
        maxShardRows = 64, lloydIters = 2, trainCap = 4096)
    },

    // AUTO-ROUTED HNSW (r18, verdict ask #1): one stats pass — the query
    // batch's probed-cell UNION over the trained centroids, the quantity
    // the measured regime boundary turns on — picks routed vs full
    // fan-out (Ann.hnswAutoTopK, the dedup routeStats pattern). The gate
    // pins the DECISION as well as the output: 20 near-random queries ×
    // top-4 of 8 cells re-cover the full cell set on every gate corpus,
    // so the taken branch is fan-out at hnswShardsFor(corpus, cores=8)
    // = the 8/8/64 gate graphs, and the oracle is the ann_hnsw_topk
    // embedded-graph search. A flipped decision (data or rule change)
    // surfaces as a hash mismatch, not silence — the runner stashes the
    // branch and `oracles` emits the SQL for the branch actually taken.
    // The routed branch's own equality twin is spec-pinned (HnswAutoSpec).
    "ann_hnsw_auto" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val stats = Ann.hnswRouteStats(emb, "vec_id", "embedding",
        col("vec_id") < 20, numCells = 8, nProbeCells = 4, cores = 8)
      hnswAutoRouted.set(java.lang.Boolean.valueOf(stats.useRouted()))
      if (stats.useRouted()) hnswRoutedModel.set(hnswRoutedDumpFor(s, d, emb))
      else hnswModel.set(hnswDumpFor(s, d, emb))
      Ann.hnswAutoTopKFromStats(emb, "vec_id", "embedding",
        col("vec_id") < 20, k = 5, nProbeCells = 4, m = 8, ef = 64,
        maxShardRows = 64, maxQueries = 4096, stats)
    },

    // STANDING routed-HNSW index (r18, verdict ask #3): the explicit
    // build/persist/query/release lifecycle. The gate builds the index at
    // the routed gate config and serves the routed gate's query batch
    // from the standing graphs — output equals ann_hnsw_routed EXACTLY
    // (spec-pinned equality + the same full DuckDB oracle re-derives
    // routing and beam), so the hash gate checks the standing path, not
    // just the transient one. The index is NOT released inside the gate:
    // the returned frame's lineage serves from the persisted shards when
    // the caller materializes it (release-then-materialize would silently
    // measure the transient path); the harnesses' per-query clearCache
    // reclaims the blocks.
    "ann_hnsw_index" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      hnswRoutedModel.set(hnswRoutedDumpFor(s, d, emb))
      Ann.buildHnswRoutedIndex(emb, "vec_id", "embedding",
        numCells = 8, m = 8, ef = 64, maxShardRows = 64)
        .topK(col("vec_id") < 20, k = 5, nProbeCells = 4)
    },

    // INCREMENTAL standing index (r18.5): the maintenance half of the
    // lifecycle — build over the even half of the corpus, INSERT the odd
    // half, serve the routed gate batch from the maintained graphs.
    // Insert is bit-identical to a fresh build at the same centroids
    // (ascending-id deterministic builds, id-deterministic sub-shard
    // membership; HnswRoutedIndexMaintenanceSpec pins graph fingerprints),
    // so the SAME routed oracle hash-checks the maintained index — a
    // drift between insert-then-query and rebuild-then-query is a hash
    // mismatch, not silence. Centroids pin to the dump's own trainer
    // (the full-corpus quantizer is the index's identity; the gate split
    // crosses maxShardRows=64 boundaries, so factor-flip reshards AND
    // stable-cell partial rebuilds both execute inside the gate).
    "ann_hnsw_index_inc" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val dump = hnswRoutedDumpFor(s, d, emb)
      hnswRoutedModel.set(dump)
      Ann.buildHnswRoutedIndexWithCentroids(
        emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
        dump.cents, m = 8, ef = 64, maxShardRows = 64)
        .insert(emb.where(col("vec_id") % 2 === 1))
        .topK(col("vec_id") < 20, k = 5, nProbeCells = 4)
    },

    // DELETE half of the maintenance story (r18.5): build the full gate
    // index, tombstone every vec_id ≡ 3 (mod 5) — which removes four of
    // the twenty gate queries too — then COMPACT and serve. Compact is
    // bit-identical to a fresh build over the survivors at the STANDING
    // centroids (HnswRoutedIndexMaintenanceSpec), so the oracle embeds
    // exactly that artifact (hnswRoutedIndexDumpWithCentroids over the
    // filtered corpus at the full-corpus trainer) and its SQL filters
    // the corpus CTE with the same predicate: removed rows must neither
    // ask nor answer, and a row that survives compaction in the wrong
    // shard is a hash mismatch, not silence.
    "ann_hnsw_index_compact" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val pred = col("vec_id") % 5 === 3
      val dump = hnswRoutedDumpFor(s, d, emb) // full-corpus cents (memoized)
      hnswCompactModel.set(Ann.hnswRoutedIndexDumpWithCentroids(
        emb.where(not(pred)), "vec_id", "embedding", dump.cents))
      Ann.buildHnswRoutedIndexWithCentroids(emb, "vec_id", "embedding",
        dump.cents, m = 8, ef = 64, maxShardRows = 64)
        .remove(pred)
        .compact()
        .topK(col("vec_id") < 20, k = 5, nProbeCells = 4)
    },

    // ---- multimodal plumbing --------------------------------------------
    // (the r8-era stub-tier gate queries — mm_payload_stats /
    // mm_frame_sample / mm_phash_neardup, which fingerprinted the TEXT
    // column through synthetic frame hashes — were retired in r10: the
    // real decode tier below proves the same plumbing on actual
    // bytes→pixels/PCM/frame walks, with mm_video_sample covering stride
    // sampling and mm_image_neardup covering perceptual near-dup)

    // REAL image decode in the gate: each qualifying document's 192-byte
    // ASCII prefix becomes the raster of an in-query binary PPM (P6 header
    // + raw RGB), [[Multimodal.decodePpm]] parses the actual bytes
    // distributed, and [[Multimodal.imageAHash]] computes the canonical
    // 8×8 average-hash (1 px per block at this size). Because the raster
    // bytes ARE the prefix's character codes, DuckDB replicates the exact
    // integer arithmetic — a FULL hash oracle over a real bytes→pixels
    // decode, not the stub. The ASCII guard (octet_length == char length)
    // keeps byte values and code points identical on both sides.
    "mm_image_decode" -> { (s, d) =>
      Multimodal.decodeImageFeatures(
        withAsciiPayload(Tables.documents(s, d), 192, ppmHeaderBytes(8, 8)),
        "doc_id", "payload")
        .withColumnRenamed("asset_id", "doc_id")
        .orderBy("doc_id")
    },

    // REAL audio decode in the gate, same construction as mm_image_decode:
    // a canonical 44-byte WAV header (all bytes constant at a fixed 256
    // samples / 8 kHz) + the document's 256-byte ASCII prefix doubled mod
    // 256 into full-range unsigned 8-bit PCM (see [[pcmDoubled]] — this
    // makes peak and the midpoint-crossing count data-dependent);
    // [[Multimodal.decodeWavPcm8]] runs the actual RIFF chunk walk
    // distributed and the features are integer-exact, so DuckDB
    // replicates them — a FULL hash oracle over a real audio decode.
    "mm_audio_decode" -> { (s, d) =>
      Multimodal.decodeAudioFeatures(
        withPcmPayload(Tables.documents(s, d), 256, wavHeaderBytes(256, 8000)),
        "doc_id", "payload")
        .withColumnRenamed("asset_id", "doc_id")
        .orderBy("doc_id")
    },

    // REAL multi-frame (video-shaped) decode in the gate: each payload is
    // two CONCATENATED PPM frames of DIFFERENT sizes (8×8 then 4×4), so
    // [[Multimodal.decodeFrames]]'s walk must take each raster length
    // from its own header — a fixed-stride reader would misparse frame 1.
    // Per-frame [[Multimodal.imageAHash]] is the fingerprint; at 4×4 the
    // 8×8 block grid is sparse (only odd rows/cols carry pixels), which
    // the oracle replicates bit-for-bit.
    "mm_video_frames" -> { (s, d) =>
      // two frames, hand-concatenated: frame 0 = 8x8 over chars 1..192,
      // frame 1 = 4x4 over chars 193..240 (the ASCII guard covers 240)
      val withPayload = asciiQualifying(Tables.documents(s, d), 240)
        .withColumn("payload", concat(
          lit(ppmHeaderBytes(8, 8)), substring(col("text"), 1, 192).cast("binary"),
          lit(ppmHeaderBytes(4, 4)), substring(col("text"), 193, 48).cast("binary")))
      Multimodal.decodeVideoFrames(withPayload, "doc_id", "payload")
        .withColumnRenamed("asset_id", "doc_id")
        .orderBy("doc_id", "frame_idx")
    },

    // near-identical images over the REAL decode path end-to-end: decode →
    // imageAHash → 16-band pigeonhole (bands > maxHamming ⇒ no qualifying
    // pair missed). Oracle = brute-force hamming self-join over the
    // replicated hash arithmetic, exactly dd_hamming's proof shape — so
    // the banding's completeness on real data is gate-checked, not just
    // spec-asserted. maxHamming 13 keeps the radius under the 16-band
    // guarantee while catching the corpus's true near-dups (identical
    // 192-char prefixes pair at hd 0).
    "mm_image_neardup" -> { (s, d) =>
      Multimodal.imageNearDupPairs(
        withAsciiPayload(Tables.documents(s, d), 192, ppmHeaderBytes(8, 8)),
        "doc_id", "payload", maxHamming = 13, bands = 16)
    },

    // near-identical audio clips through the REAL decode path: WAV decode
    // → energy-window fingerprint → 16-band pigeonhole; oracle = the
    // brute-force hamming self-join over the replicated energy arithmetic
    // (identical 256-char prefixes pair at hd 0), completing the
    // text/image/audio near-dup triad — all three gate-checked against
    // brute force.
    "mm_audio_neardup" -> { (s, d) =>
      Multimodal.audioNearDupPairs(
        withPcmPayload(Tables.documents(s, d), 256, wavHeaderBytes(256, 8000)),
        "doc_id", "payload", maxHamming = 12, bands = 16)
    },

    // near-identical VIDEO CLIPS through the REAL multi-frame decode path,
    // completing the text/image/audio/video near-dup quad: each payload is
    // three concatenated PPM frames of MIXED sizes (8×8, 8×8, 4×4 over
    // chars 1..192, 193..384, 385..432 — the header-driven walk is load-
    // bearing), per-frame aHash, then the majority-vote clip signature.
    // The 4×4 frame's sparse hash votes +1 only on its populated odd
    // (row,col) bits, so dense bits need both 8×8 frames set (+2-1) and
    // sparse bits a true 2-of-3 majority — all 64 bits vary across docs,
    // keeping every band informative (no degenerate all-zero band
    // buckets, which a uniformly-4×4 clip would create). Oracle =
    // brute-force hamming self-join over the replicated vote arithmetic;
    // at maxHamming 12 < 16 bands the pigeonhole guarantee makes banding
    // completeness gate-checked on real data (the corpus separates: true
    // near-dup pairs at hd 0, noise floor starts at hd 13 at sf0.01).
    "mm_video_neardup" -> { (s, d) =>
      Multimodal.videoNearDupPairs(withVideoPayload432(Tables.documents(s, d)),
        "doc_id", "payload", maxHamming = 12, bands = 16)
    },

    // the SAMPLED decode path in the gate: the same three-frame payload at
    // stride 2 materializes frames 0 and 2 only — frame 1 is header-parsed
    // and SKIPPED (sampleFrames' raster-skip walk, the I/O economics a
    // video pipeline runs at scale). The oracle emits exactly the frame-0
    // 8×8 hash and the frame-2 sparse 4×4 hash; a walker that misparsed
    // the skipped frame's length would compute frame 2 from the wrong
    // offset and hash-mismatch.
    "mm_video_sample" -> { (s, d) =>
      Multimodal.sampleVideoFrames(withVideoPayload432(Tables.documents(s, d)),
        "doc_id", "payload", stride = 2)
        .withColumnRenamed("asset_id", "doc_id")
        .orderBy("doc_id", "frame_idx")
    },

    // the LENIENT decode tier in the gate: a deterministic in-query
    // corruption rule (doc_id % 7 == 0 → truncated raster, last byte
    // dropped; doc_id % 7 == 3 → corrupted magic byte) damages a known
    // subset of the mm_image_decode payloads, and
    // decodeImageFeaturesLenient must turn EXACTLY those into
    // null-feature rows carrying the parser's error string while decoding
    // the rest bit-for-bit — the corrupt-corpus contract (a bad sample
    // can never fail a task, and the error accounting is queryable)
    // proven end-to-end, not just spec-side. The oracle replicates the
    // corruption rule, the clean-row decode arithmetic, and the two
    // literal error messages.
    "mm_decode_errors" -> { (s, d) =>
      val header = ppmHeaderBytes(8, 8)
      val corruptHeader = { val h = header.clone(); h(0) = 'X'.toByte; h }
      val withPayload = asciiQualifying(Tables.documents(s, d), 192)
        .withColumn("payload",
          when(col("doc_id") % 7 === 0,
            concat(lit(header), substring(col("text"), 1, 191).cast("binary")))
          .when(col("doc_id") % 7 === 3,
            concat(lit(corruptHeader), substring(col("text"), 1, 192).cast("binary")))
          .otherwise(
            concat(lit(header), substring(col("text"), 1, 192).cast("binary"))))
      Multimodal.decodeImageFeaturesLenient(withPayload, "doc_id", "payload")
        .withColumnRenamed("asset_id", "doc_id")
        .orderBy("doc_id")
    },

    // resize-then-hash in the gate: the same 8×8 in-query PPM payloads as
    // mm_image_decode, box-downscaled 8×8→4×4 (exact floor means over 2×2
    // boxes, resizeBox) before feature extraction — the normalization step
    // an image-dedup pipeline runs so different-resolution captures share
    // one signature. Features are those of the RESIZED raster (4×4 aHash =
    // the sparse odd-(row,col) block grid, as in mm_video_frames' frame 1);
    // the oracle replicates the box means and the hash bit-for-bit.
    "mm_image_resize" -> { (s, d) =>
      Multimodal.decodeResizedImageFeatures(
        withAsciiPayload(Tables.documents(s, d), 192, ppmHeaderBytes(8, 8)),
        "doc_id", "payload", outW = 4, outH = 4)
        .withColumnRenamed("asset_id", "doc_id")
        .orderBy("doc_id")
    },

    // the lenient AUDIO decode in the gate, completing the corrupt-corpus
    // contract across all three modalities: dropping the payload's final
    // byte (doc_id % 3 == 0) makes the data chunk's declared size overrun
    // the file, so the RIFF walk must reject it with its exact message
    // while clean docs keep the mm_audio_decode features bit-for-bit.
    "mm_audio_errors" -> { (s, d) =>
      val withCorrupt = withPcmPayload(
          Tables.documents(s, d), 256, wavHeaderBytes(256, 8000))
        .withColumn("payload",
          when(col("doc_id") % 3 === 0,
            expr("substring(payload, 1, length(payload) - 1)"))
          .otherwise(col("payload")))
      Multimodal.decodeAudioFeaturesLenient(withCorrupt, "doc_id", "payload")
        .withColumnRenamed("asset_id", "doc_id")
        .orderBy("doc_id")
    },

    // the lenient VIDEO walk's prefix semantics in the gate: dropping the
    // final raster byte of the shared three-frame stream (doc_id % 5 == 0)
    // must keep frames 0 and 1 bit-for-bit and append ONE error row whose
    // message carries frame 2's exact byte offset (406 = two 11-byte
    // headers + two 192-byte rasters) — a truncated tail loses only the
    // tail, the contract that makes a 100 TB crawl resumable. Clean docs
    // are identical to a strict decode plus an all-null error column.
    "mm_video_errors" -> { (s, d) =>
      val withCorrupt = withVideoPayload432(Tables.documents(s, d))
        .withColumn("payload",
          when(col("doc_id") % 5 === 0,
            expr("substring(payload, 1, length(payload) - 1)"))
          .otherwise(col("payload")))
      Multimodal.decodeVideoFramesLenient(withCorrupt, "doc_id", "payload")
        .withColumnRenamed("asset_id", "doc_id")
        .orderBy("doc_id", "frame_idx")
    }
  )

  // ---------------------------------------- in-query binary payloads

  /** Documents whose `len`-char prefix is pure ASCII (octet length ==
    * char length) — the guard that keeps raster/PCM byte values identical
    * to the character codes DuckDB sees, which is what lets the oracles
    * replicate the decode arithmetic.
    */
  private def asciiQualifying(docs: DataFrame, len: Int): DataFrame =
    docs.where(length(col("text")) >= len &&
      octet_length(substring(col("text"), 1, len)) === len)

  /** ONE definition of each constant header so a decode query and its
    * near-dup twin can never drift onto different payloads.
    */
  private def ppmHeaderBytes(w: Int, h: Int): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Canonical 44-byte WAV header for `n` 8-bit mono PCM samples at
    * `sampleRate` — every byte constant for fixed (n, sampleRate), which
    * is what makes the oracle's arithmetic purely a function of the
    * text prefix.
    */
  private def wavHeaderBytes(n: Int, sampleRate: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + n).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate).putShort(1).putShort(8)
    bb.put("data".getBytes).putInt(n)
    bb.array()
  }

  /** Qualifying documents with a `payload` column = `header` ++ the
    * `len`-char ASCII prefix as raw bytes.
    */
  private def withAsciiPayload(
      docs: DataFrame, len: Int, header: Array[Byte]): DataFrame =
    asciiQualifying(docs, len).withColumn("payload",
      concat(lit(header), substring(col("text"), 1, len).cast("binary")))

  /** ONE definition of the three-frame video payload (8×8, 8×8, 4×4 over
    * chars 1..192, 193..384, 385..432) shared by every video gate query
    * AND the streaming parity spec, so the near-dup, sampling, lenient,
    * and streaming twins can never drift onto different streams.
    */
  private[graft] def withVideoPayload432(docs: DataFrame): DataFrame =
    asciiQualifying(docs, 432)
      .withColumn("payload", concat(
        lit(ppmHeaderBytes(8, 8)), substring(col("text"), 1, 192).cast("binary"),
        lit(ppmHeaderBytes(8, 8)), substring(col("text"), 193, 192).cast("binary"),
        lit(ppmHeaderBytes(4, 4)), substring(col("text"), 385, 48).cast("binary")))

  /** PCM "audio-ification" of an ASCII prefix: each byte doubles mod 256
    * (oracle side: `(ascii*2) % 256`), spreading the 0–127 ASCII band over
    * the full unsigned-8-bit range so the decoded samples genuinely
    * straddle the 128 midpoint — peak exceeds 127 and midpoint crossings
    * are DATA-dependent (code < 64 vs ≥ 64), not identically zero the way
    * raw ASCII PCM left them. (A position-keyed XOR mask would instead
    * make crossings a corpus-wide constant — every masked/unmasked
    * boundary crosses — which exercises the code path but not the data
    * dependence.) ONE builder shared by the audio decode query and its
    * near-dup twin, so both always see the same payloads.
    */
  private val pcmDoubled = udf { (s: String) =>
    val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var i = 0
    while (i < b.length) { b(i) = (b(i) << 1).toByte; i += 1 }
    b
  }

  private def withPcmPayload(
      docs: DataFrame, len: Int, header: Array[Byte]): DataFrame =
    asciiQualifying(docs, len).withColumn("payload",
      concat(lit(header), pcmDoubled(substring(col("text"), 1, len))))

  // ------------------------------------------------------------ oracles

  private val tokensSql = """regexp_split_to_array(trim(text), '\s+')"""
  private val polyHashSql =
    """list_reduce(list_prepend(0::BIGINT,
         list_transform(string_split(%s, ''), c -> ascii(c)::BIGINT)),
         (a, x) -> (a*%d + x) %% 1000000007)"""
  private def ph(e: String, base: Int) = polyHashSql.format(e, base)

  // exact-decontamination SQL, shared verbatim by cur_decontaminate and
  // cur_decontaminate_bloom (the bloom prefilter is output-invariant)
  private lazy val decontaminateOracle =
    s"""WITH toks AS (
          SELECT doc_id, $tokensSql AS w FROM documents
        ), sh AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, len(w)-2),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
          FROM toks
        ), ex AS (
          SELECT doc_id, unnest(shingles) AS s FROM sh
        ), bench AS (
          SELECT DISTINCT s FROM ex WHERE doc_id < 20
        ), contaminated AS (
          SELECT DISTINCT e.doc_id FROM ex e JOIN bench b ON e.s = b.s
          WHERE e.doc_id >= 20
        )
        SELECT doc_id, CAST(LENGTH(text) AS INTEGER) AS text_len
        FROM documents
        WHERE doc_id >= 20
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        ORDER BY doc_id"""

  // the cur_pii_* injection, mirroring piiInjectedDocs EXACTLY (same kind
  // selection, same lpad digits) — non-interpolated fragments so no Scala
  // escape processing touches the SQL
  private val piiEmailSql =
    """' reach user' || doc_id || '@mail' || (doc_id % 7) || '.example.com'"""
  private val piiPhoneSql =
    """' call ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
       lpad(CAST((doc_id*7) % 1000 AS VARCHAR), 3, '0') || '-' ||
       lpad(CAST((doc_id*13) % 10000 AS VARCHAR), 4, '0') || ' now'"""
  private val piiIpSql =
    """' host ' || (doc_id % 256) || '.' || ((doc_id*3) % 256) || '.' ||
       ((doc_id*5) % 256) || '.' || ((doc_id*7) % 256) || ' up'"""
  private lazy val piiInjectSql =
    s"""SELECT doc_id,
          text || CASE
            WHEN doc_id % 8 = 7 THEN $piiEmailSql || $piiPhoneSql || $piiIpSql
            WHEN doc_id % 4 = 0 THEN $piiEmailSql
            WHEN doc_id % 4 = 1 THEN $piiPhoneSql
            WHEN doc_id % 4 = 2 THEN $piiIpSql
            ELSE '' END AS text
        FROM documents"""

  private val qualitySql =
    s"""FLOOR((
            0.4 * LEAST(len($tokensSql) / 200.0, 1.0) +
            0.3 * (len(list_filter($tokensSql,
                     t -> list_contains(['the','a','of','and','to','is'], t)))
                   / GREATEST(len($tokensSql), 1)) +
            0.3 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / GREATEST(length(text), 1))) * 10000.0 + 0.5) / 10000.0"""

  /** Full Jaccard pair SQL; `extraWhere` restricts the pair set (e.g. the
    * incremental "touches a new doc" predicate) without changing the
    * arithmetic.
    */
  private def shingleCteWhere(extraWhere: String) =
    s"""WITH toks AS (
          SELECT doc_id, $tokensSql AS w FROM documents
        ), sh AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, len(w)-2),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
          FROM toks
        ), ex AS (
          SELECT doc_id, unnest(shingles) AS s FROM sh
        ), pairs AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ), sz AS (SELECT doc_id, len(shingles) AS n FROM sh)
        SELECT d1, d2, CAST(inter AS BIGINT) AS inter,
               FLOOR(inter / (s1.n + s2.n - inter) * 1000000.0 + 0.5) / 1000000.0 AS j
        FROM pairs JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        WHERE inter / (s1.n + s2.n - inter) >= 0.5$extraWhere
        ORDER BY d1, d2"""

  private val shingleCte = shingleCteWhere("")

  /** The lshTopK hyperplane matrix as DuckDB VALUES rows `(pg, DOUBLE[])`:
    * one row per global plane pg = table*numPlanes + bit, components from
    * [[Ann.planeComponent]] — the single source of truth the UDF also uses.
    */
  private def lshPlanesValues(tables: Int, numPlanes: Int, dim: Int): String =
    (0 until tables * numPlanes).map { pg =>
      val comps = (0 until dim).map(j => Ann.planeComponent(pg, j).toString).mkString(",")
      s"($pg,[$comps])"
    }.mkString(",")

  private val dotSql =
    """list_reduce(list_prepend(0.0, list_transform(
         generate_series(1, len(%s)), i -> %s[i]::DOUBLE * %s[i]::DOUBLE)),
         (x, y) -> x + y)"""
  private def dot(a: String, b: String) = dotSql.format(a, a, b)

  /** The IVF centroid matrix trained by the last `ann_ivf_topk` build in
    * this JVM. Verify runs every query BEFORE dumping oracle SQL, so by
    * dump time this holds the matrix for exactly the sf dir under test;
    * when unset (e.g. a run that skipped ann_ivf_topk) the oracle entry is
    * simply omitted and the driver records its old rows-only check.
    */
  private[graft] val ivfTrainedCentroids =
    new java.util.concurrent.atomic.AtomicReference[Array[Array[Double]]]()

  /** The IVF-PQ model (coarse centroids + per-subspace residual codebooks)
    * trained by the last `ann_ivfpq_topk` build in this JVM — the
    * [[ivfTrainedCentroids]] life-cycle extended to both quantizer layers.
    */
  private[graft] val pqTrainedModel =
    new java.util.concurrent.atomic.AtomicReference[Ann.PqModel]()

  /** Centroids trained by the last `dd_cosine_neardup_ivf` build in this
    * JVM (the [[ivfTrainedCentroids]] life-cycle; a separate reference so
    * the pair gate never silently couples to whether the top-k gate ran).
    */
  private[graft] val ivfPairCents =
    new java.util.concurrent.atomic.AtomicReference[Array[Array[Double]]]()

  /** Centroids trained by the last `cur_semantic_ivf` build in this JVM
    * (trained on the quality-KEPT embedding subset, so a separate
    * reference from [[ivfPairCents]] — the two quantizers see different
    * corpora and must never silently couple).
    */
  private[graft] val semanticIvfCents =
    new java.util.concurrent.atomic.AtomicReference[Array[Array[Double]]]()

  /** Centroids trained by the last `dd_cosine_neardup_inc` build in this
    * JVM (same no-silent-coupling rationale as [[ivfPairCents]]).
    */
  private[graft] val ivfIncCents =
    new java.util.concurrent.atomic.AtomicReference[Array[Array[Double]]]()

  /** The HNSW shard graphs rebuilt by the last `ann_hnsw_topk` run in this
    * JVM (the [[ivfTrainedCentroids]] life-cycle).
    */
  private[graft] val hnswModel =
    new java.util.concurrent.atomic.AtomicReference[Array[Ann.HnswShardDump]]()

  /** The routed-HNSW artifact (centroids + cell-sharded graphs) rebuilt by
    * the last `ann_hnsw_routed` run in this JVM (same life-cycle).
    */
  private[graft] val hnswRoutedModel =
    new java.util.concurrent.atomic.AtomicReference[Ann.HnswRoutedDump]()

  /** The branch the last `ann_hnsw_auto` run took in this JVM (true =
    * routed) — the oracle for that gate must re-derive the SEARCH THAT
    * ACTUALLY RAN, so the emission picks the routed or fan-out SQL from
    * this stash (same life-cycle as the models; a flipped decision
    * changes the emitted oracle AND the result, keeping the hash gate
    * honest rather than vacuous).
    */
  private[graft] val hnswAutoRouted =
    new java.util.concurrent.atomic.AtomicReference[java.lang.Boolean]()

  /** The post-compact routed artifact rebuilt by the last
    * `ann_hnsw_index_compact` run in this JVM: graphs over the SURVIVING
    * corpus at the FULL-corpus centroids (a compacted index keeps its
    * standing quantizer), the exact relation compact's bit-identity
    * contract promises.
    */
  private[graft] val hnswCompactModel =
    new java.util.concurrent.atomic.AtomicReference[Ann.HnswRoutedDump]()

  /** Cache of the oracle dump keyed by (dir, content fingerprint) — see
    * the gate comment. The fingerprint (file listing + sizes + mtimes of
    * the embeddings parquet, one cheap driver-side directory walk) makes
    * in-session data rewrites a cache MISS: the old (session, dir)-only
    * key silently replayed a stale dump against freshly built graphs, a
    * false gate failure waiting to happen (r15 ADVICE). Stale entries for
    * overwritten data are evicted on insert (same dir, different print),
    * and [[clearHnswDumps]] releases everything.
    */
  private val hnswDumpMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Array[Ann.HnswShardDump]]

  /** name:size:mtime:tailCrc for every regular file under the dir's
    * embeddings parquet (or the file itself), sorted — a cheap,
    * deterministic proxy for "did anyone rewrite this data". Parquet
    * writers always produce new part files (new names/mtimes), so any
    * overwrite changes the print; the tail CRC (last 64 bytes — the
    * parquet footer, which encodes row counts and column stats) breaks
    * the residual alias where an in-place rewrite lands the same sizes
    * within mtime granularity (r15 verdict note).
    *
    * Returns None for a dir java.nio cannot resolve (hdfs://, s3a://
    * schemes): the old code hashed every such state to the same
    * `absent:` constant, silently re-enabling the stale-dump replay this
    * key exists to prevent (r15 ADVICE). None tells the caller "do not
    * memoize". `file:` URIs are local and are stripped to their path.
    *
    * Scheme detection is java.net.URI, not a `://` regex (r16 ADVICE):
    * Hadoop's `Path.toString` emits SINGLE-slash URIs (`hdfs:/nn/p`,
    * `file:/tmp/x`) that a `://` match classified as local paths — a
    * remote one then resolved to a nonexistent local file and hashed to
    * the constant `absent:` print, re-enabling the replay again. A string
    * URI cannot parse (bare paths with spaces etc.) cannot carry a
    * scheme, so it is local by construction.
    */
  private[graft] def embeddingsFingerprint(d: String): Option[String] = {
    val local = scala.util.Try(new java.net.URI(d)).toOption match {
      case Some(u) if u.getScheme == null => d
      case Some(u) if u.getScheme.equalsIgnoreCase("file") =>
        // opaque file:rel has no path component -> cannot resolve -> no memo
        if (u.getPath == null || u.getPath.isEmpty) return None else u.getPath
      case Some(_) => return None
      case None => d
    }
    val root = java.nio.file.Paths.get(local, "embeddings.parquet")
    if (!java.nio.file.Files.exists(root)) Some(s"absent:$root")
    else {
      val s = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        Some(s.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map { p =>
            val size = java.nio.file.Files.size(p)
            val tail = {
              val n = math.min(64L, size).toInt
              val ch = java.nio.file.Files.newByteChannel(p)
              try {
                ch.position(size - n)
                val buf = java.nio.ByteBuffer.allocate(n)
                while (buf.hasRemaining && ch.read(buf) >= 0) {}
                val crc = new java.util.zip.CRC32()
                crc.update(buf.array(), 0, buf.position())
                crc.getValue
              } finally ch.close()
            }
            s"${root.relativize(p)}:$size:" +
              s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}:$tail"
          }
          .toSeq.sorted.mkString("|"))
      } finally s.close()
    }
  }

  /** The memoized oracle dump for the embeddings under `d` — rebuilds iff
    * the content fingerprint changed since the last build in this JVM.
    * An unfingerprintable dir (remote scheme → [[embeddingsFingerprint]]
    * None) falls back to an unmemoized rebuild: correct every time, just
    * without the cache.
    */
  private[graft] def hnswDumpFor(s: org.apache.spark.sql.SparkSession,
      d: String, emb: DataFrame): Array[Ann.HnswShardDump] = {
    val fp = embeddingsFingerprint(d) match {
      case None => return Ann.hnswIndexDump(emb, "vec_id", "embedding")
      case Some(f) => f
    }
    val dump = hnswDumpMemo.getOrElseUpdate((d, fp),
      Ann.hnswIndexDump(emb, "vec_id", "embedding"))
    // evict superseded prints for the same dir (bounded memo: one live
    // entry per dir; the dumps hold full adjacency arrays)
    hnswDumpMemo.keys.foreach { case k @ (kd, kfp) =>
      if (kd == d && kfp != fp) hnswDumpMemo.remove(k)
    }
    dump
  }

  /** [[hnswDumpFor]] for the routed artifact — same content-fingerprint
    * memo discipline, a separate map because the value types differ.
    */
  private val hnswRoutedDumpMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Ann.HnswRoutedDump]

  private[graft] def hnswRoutedDumpFor(s: org.apache.spark.sql.SparkSession,
      d: String, emb: DataFrame): Ann.HnswRoutedDump = {
    def build() = Ann.hnswRoutedIndexDump(emb, "vec_id", "embedding")
    val fp = embeddingsFingerprint(d) match {
      case None => return build()
      case Some(f) => f
    }
    val dump = hnswRoutedDumpMemo.getOrElseUpdate((d, fp), build())
    hnswRoutedDumpMemo.keys.foreach { case k @ (kd, kfp) =>
      if (kd == d && kfp != fp) hnswRoutedDumpMemo.remove(k)
    }
    dump
  }

  /** Drop every memoized HNSW oracle dump (test/maintenance hook — the
    * boilerplate-memo release discipline applied here).
    */
  private[graft] def clearHnswDumps(): Unit = {
    hnswDumpMemo.clear()
    hnswRoutedDumpMemo.clear()
  }

  /** The BPE state trained by the last `tx_bpe_encode` build in this JVM —
    * same life-cycle as [[ivfTrainedCentroids]] (Verify runs queries before
    * the oracle dump). The oracle embeds a word→tokens literal dim derived
    * via the independent reference encoder; it is only emittable when the
    * collected word-frequency table is COMPLETE (`Trained.complete` — the
    * vocabCap never truncated), otherwise the entry is omitted and the
    * driver records the rows-only check.
    */
  private[graft] val bpeTrained =
    new java.util.concurrent.atomic.AtomicReference[Bpe.Trained]()

  /** (idf per term, avgdl) computed by the last `ir_bm25_topk` build in
    * this JVM (the [[ivfTrainedCentroids]] life-cycle).
    */
  private[graft] val bm25State =
    new java.util.concurrent.atomic.AtomicReference[(Seq[(String, Double)], Double)]()

  /** BM25 oracle: idf literals from the driver, every downstream op —
    * tf, dl, the saturation fraction, the weighted sum, the e6 rounding,
    * the (score desc, doc_id) top-20 — re-derived by DuckDB.
    */
  private def bm25Oracle(idfs: Seq[(String, Double)], avgdl: Double): String =
    s"""WITH toks AS (SELECT doc_id, $tokensSql AS w FROM documents),
        scored AS (SELECT doc_id,
          ${Retrieval.scoreSql("w", idfs, avgdl)} AS score FROM toks)
        SELECT doc_id,
               CAST(FLOOR(score * 1000000.0 + 0.5) AS BIGINT) AS score_e6
        FROM scored ORDER BY score DESC, doc_id LIMIT 20"""

  /** (idf per term, avgdl) computed by the last `ir_batch_bm25` build in
    * this JVM.
    */
  private[graft] val batchBm25State =
    new java.util.concurrent.atomic.AtomicReference[(Seq[(String, Double)], Double)]()

  /** Per-lang (p25, p50, p75) sketch outputs from the last
    * `tx_quantiles_sketch` run in this JVM (the [[ivfTrainedCentroids]]
    * life-cycle).
    */
  private[graft] val quantileSketchState =
    new java.util.concurrent.atomic.AtomicReference[Array[(String, Double, Double, Double)]]()

  /** Bounds oracle for the quantile sketch: the sketch values as DOUBLE
    * literals, then DuckDB re-derives from the raw corpus (a) membership —
    * percentile_approx returns an OBSERVED value, so each literal must
    * equal some group member — and (b) the Greenwald-Khanna rank
    * guarantee: the value's rank interval [count(n < v) + 1, count(n ≤ v)]
    * must intersect [(φ − ε)·N, (φ + ε)·N] with ε = 1/accuracy = 1e-4
    * (±1 slop for integer rank boundaries). A value inside the window
    * echoes back and the row hashes identical to the Spark output; a
    * violation yields NULL and the gate goes red. Independent because
    * DuckDB checks the property from the data — the literals only tell it
    * WHICH values to check, not whether they pass.
    */
  private def quantilesSketchOracle(
      rows: Array[(String, Double, Double, Double)]): String = {
    val eps = 1.0 / 10000.0
    val dim = rows.map { case (l, a, b, c) =>
      s"('${l.replace("'", "''")}', $a, $b, $c)"
    }.mkString(",")
    def chk(p: String, phi: Double): String =
      s"""CASE WHEN eq$p > 0
            AND lt$p + 1 <= ($phi + $eps) * n_docs + 1.0
            AND le$p     >= ($phi - $eps) * n_docs - 1.0
          THEN p$p END AS p$p"""
    def cnts(p: String): String =
      s"""SUM(CASE WHEN v.n <  s.p$p THEN 1 ELSE 0 END) AS lt$p,
          SUM(CASE WHEN v.n <= s.p$p THEN 1 ELSE 0 END) AS le$p,
          SUM(CASE WHEN v.n =  s.p$p THEN 1 ELSE 0 END) AS eq$p"""
    s"""WITH sk(lang, p25, p50, p75) AS (VALUES $dim),
        vals AS (SELECT lang, CAST(len($tokensSql) AS DOUBLE) AS n
                 FROM documents),
        chk AS (SELECT v.lang, s.p25, s.p50, s.p75,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            ${cnts("25")}, ${cnts("50")}, ${cnts("75")}
          FROM vals v JOIN sk s ON v.lang = s.lang
          GROUP BY v.lang, s.p25, s.p50, s.p75)
        SELECT lang, n_docs, ${chk("25", 0.25)}, ${chk("50", 0.50)},
               ${chk("75", 0.75)}
        FROM chk ORDER BY lang"""
  }

  /** Batch-BM25 oracle: the (query, term, idf) dim as literals, postings /
    * fixed-point parts / integer sums / per-query top-10 re-derived by
    * DuckDB.
    */
  private def batchBm25Oracle(idfs: Seq[(String, Double)], avgdl: Double): String = {
    val idfMap = idfs.toMap
    val qdVals = Retrieval.QueryBatch.flatMap { case (qid, ts) =>
      ts.map(t => s"($qid, '$t', ${idfMap(t)})")
    }.mkString(",")
    val termList = Retrieval.QueryBatch.flatMap(_._2).distinct.sorted
      .map(t => s"'$t'").mkString(", ")
    val satur = s"""((CAST(t.tf AS DOUBLE) * ${Retrieval.K1 + 1}) /
        (CAST(t.tf AS DOUBLE) + ${Retrieval.K1} *
         (${1 - Retrieval.B} + ${Retrieval.B} * (t.dl / $avgdl))))"""
    s"""WITH qd(query_id, term, idf) AS (VALUES $qdVals),
        toks AS (SELECT doc_id, $tokensSql AS w FROM documents),
        post AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
                        unnest(w) AS term FROM toks),
        tf AS (SELECT doc_id, term, dl, COUNT(*) AS tf FROM post
               WHERE term IN ($termList) GROUP BY doc_id, term, dl),
        parts AS (SELECT q.query_id, t.doc_id,
            CAST(FLOOR(q.idf * $satur * 1000000000.0 + 0.5) AS BIGINT) AS p
          FROM tf t JOIN qd q ON t.term = q.term),
        score AS (SELECT query_id, doc_id, CAST(SUM(p) AS BIGINT) AS score_e9
                  FROM parts GROUP BY query_id, doc_id)
        SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, score_e9
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score_e9 DESC, doc_id) AS rank FROM score)
        WHERE rank <= 10 ORDER BY query_id, rank"""
  }

  /** Weights trained by the last `tx_quality_classifier` build in this
    * JVM (the [[ivfTrainedCentroids]] life-cycle).
    */
  private[graft] val classifierWeights =
    new java.util.concurrent.atomic.AtomicReference[Array[Double]]()

  /** Classifier oracle: the trained coefficients as double literals over
    * the shared feature SQL — verifies the corpus-wide scoring projection
    * (features, dot product, fixed-point rounding, prediction threshold)
    * independently of training.
    */
  private def classifierOracle(w: Array[Double]): String =
    s"""WITH scored AS (
          SELECT doc_id, ${QualityClassifier.logitSql(w)} AS logit
          FROM documents
        )
        SELECT doc_id,
               CAST(FLOOR(logit * 1000000.0 + 0.5) AS BIGINT) AS logit_e6,
               CASE WHEN logit >= 0.0 THEN 1 ELSE 0 END AS pred
        FROM scored ORDER BY doc_id"""

  /** BPE-packing oracle: per-word reference token counts as literals, per-
    * doc counts by a word join, then the same running-sum/pack arithmetic
    * as sm_pack's oracle.
    */
  private def bpePackOracle(tr: Bpe.Trained): String = {
    val dim = tr.wordFreq.map(_._1).sorted.map { w =>
      val n = Bpe.referenceEncodeWord(w, tr.merges).length
      s"('${w.replace("'", "''")}', $n)"
    }.mkString(",")
    s"""WITH wt(word, n) AS (VALUES $dim),
        tw AS (SELECT doc_id, unnest($tokensSql) AS word FROM documents),
        agg AS (SELECT doc_id, CAST(SUM(wt.n) AS BIGINT) AS n
                FROM tw JOIN wt ON tw.word = wt.word GROUP BY doc_id),
        cnt AS (SELECT d.doc_id, COALESCE(agg.n, 0) AS n
                FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id)
        SELECT doc_id, CAST(n AS INTEGER) AS n_bpe,
               CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS running,
               CAST(FLOOR((SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n)
                    / 2048.0) AS BIGINT) AS pack_id
        FROM cnt ORDER BY doc_id"""
  }

  /** BPE oracle: the word→tokens dim as literals (reference-encoded), then
    * per-document re-assembly in SQL — word ordinals via generate_series,
    * token counts summed, tokens string_agg'd in word order. Verifies the
    * distributed native-kernel encode against the driver-side textbook
    * encoder over every corpus document.
    */
  private def bpeOracle(tr: Bpe.Trained): String = {
    val dim = tr.wordFreq.map(_._1).sorted.map { w =>
      val toks = Bpe.referenceEncodeWord(w, tr.merges)
      val esc = w.replace("'", "''")
      s"('$esc', '${toks.mkString("|").replace("'", "''")}', ${toks.length})"
    }.mkString(",")
    s"""WITH wt(word, toks, n) AS (VALUES $dim),
        tk AS (SELECT doc_id, $tokensSql AS w FROM documents),
        ti AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM tk),
        tw AS (SELECT doc_id, i, w[i] AS word FROM ti),
        agg AS (SELECT tw.doc_id, CAST(SUM(wt.n) AS INTEGER) AS n_bpe,
                       string_agg(wt.toks, '|' ORDER BY tw.i) AS bpe_text
                FROM tw JOIN wt ON tw.word = wt.word GROUP BY tw.doc_id)
        SELECT d.doc_id, COALESCE(agg.n_bpe, 0) AS n_bpe,
               COALESCE(agg.bpe_text, '') AS bpe_text
        FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
        ORDER BY d.doc_id"""
  }

  /** IVF oracle: embeds the trained centroids as literal DOUBLE[] rows
    * (Double.toString round-trips bit-exactly through DuckDB's parser —
    * same as lshPlanesValues), then replicates assignment (argmax of the
    * ascending-i dot fold over the L2-normalized vector, ties to the lower
    * cell), nProbe probing, and exact re-ranking — so everything DOWNSTREAM
    * of training is verified independently by DuckDB.
    */
  /** The shared assignment CTE prefix: centroid literals, vector prep,
    * argmax cell per vector — reused by the IVF probe oracle and the
    * cluster-balanced curation oracle.
    */
  /** Centroid matrix → SQL VALUES rows `(cell,[w...])` — ONE copy of the
    * literal serialization (Double.toString is shortest-round-trip, so
    * DuckDB parses back the identical bits) shared by every oracle that
    * embeds a trained quantizer: [[ivfAssignCte]] and [[hnswRoutedOracle]].
    */
  private def centroidValuesSql(cents: Array[Array[Double]]): String =
    cents.zipWithIndex.map { case (w, c) =>
      s"($c,[${w.map(_.toString).mkString(",")}])"
    }.mkString(",")

  private def ivfAssignCte(
      cents: Array[Array[Double]], embWhere: String = ""): String = {
    val centsValues = centroidValuesSql(cents)
    val uDotW = """list_reduce(list_prepend(0.0, list_transform(
           generate_series(1, len(u)), i -> u[i] * w[i])), (x, y) -> x + y)"""
    s"""cents(cell, w) AS (VALUES $centsValues),
        emb AS (
          SELECT vec_id AS id, embedding,
                 SQRT(${dot("embedding", "embedding")}) AS n
          FROM embeddings $embWhere
        ), nv AS (
          SELECT id, CASE WHEN n = 0.0
                   THEN list_transform(embedding, x -> x::DOUBLE)
                   ELSE list_transform(embedding, x -> x::DOUBLE / n) END AS u
          FROM emb
        ), cellscore AS (
          SELECT id, cell, $uDotW AS dt FROM nv CROSS JOIN cents
        ), assign AS (
          SELECT id, cell FROM (SELECT id, cell,
              ROW_NUMBER() OVER (PARTITION BY id ORDER BY dt DESC, cell) AS r
            FROM cellscore) WHERE r = 1
        )"""
  }

  /** HNSW oracle: the embedded-literal trick applied to a GRAPH index.
    * The deterministic shard graphs are the trained artifact (the IVF-
    * centroid seam): entry points + adjacency lists ride the SQL as
    * literals, and DuckDB independently re-derives every SEARCH decision
    * from the raw parquet vectors:
    *
    *   1. L2 normalization with ivfPrep's exact arithmetic (zero-norm
    *      vectors keep their raw coordinates, as in the Scala prep);
    *   2. the per-(query, node) dot matrix over normalized vectors
    *      (left-to-right fold — bit-identical doubles, so every
    *      comparison below lands the same way);
    *   3. the greedy upper-level descent (recursive CTE `walk`): at each
    *      level, move to the best of {current} ∪ neighbors by (sim DESC,
    *      id ASC) until a fixpoint, then descend — the argmax is
    *      list_sort ascending on (negs = −sim, id) then element 1;
    *   4. the ef-bounded level-0 beam sweep (recursive CTE `beam`): one
    *      candidate-heap pop per iteration, termination when the popped
    *      sim is strictly below the worst retained result with the heap
    *      full, then a WHOLE-EXPANSION batch step:
    *      res' = top-ef(res ∪ unvisited-neighbors),
    *      cand' = sorted(rest ∪ unvisited-neighbors).
    *      This is provably equal to the kernel's sequential bounded-heap
    *      insertion: (a) a bounded min-heap streamed over items yields
    *      exactly the top-ef of everything examined — an item rejected
    *      against the then-worst is dominated by ef retained items and
    *      can never re-enter; (b) adding rejected (dominated) items to
    *      the candidate heap never changes which nodes get EXPANDED,
    *      because a dominated item pops only after everything better,
    *      at which point it is below the (monotone) worst with a full
    *      heap — the same immediate termination the faithful heap
    *      reaches on its next pop. HnswOracleEquivalenceSpec pins this
    *      equivalence against the heap-faithful kernel. (The batch form
    *      also sidesteps a DuckDB 1.0 defect: list_reduce over struct
    *      accumulators inside a RECURSIVE term returns corrupted lists
    *      once the working table spans multiple vector chunks — observed
    *      as cross-shard ids; list_sort/list_filter/list_slice are
    *      reliable there, so the recursion uses only those.)
    *   5. per-shard top-k with self exclusion, then the exact cosine
    *      re-rank over ORIGINAL vectors with the shared zero-norm guards
    *      (the ann_cosine contract).
    *
    * Sorted lists stand in for both heaps: ascending (negs = −sim, id)
    * puts the BEST candidate at position 1 (pop) and the WORST retained
    * result at position len (termination comparison + trim), exactly
    * the kernel's two priority-queue orderings.
    */
  private def hnswOracle(
      model: Array[Ann.HnswShardDump], dim: Int, k: Int, ef: Int): String = {
    val entryRows = model.collect {
      case d if d.entryId >= 0 => s"(${d.shard},${d.entryId},${d.entryLevel})"
    }
    val entryVals =
      (if (entryRows.isEmpty) Array("(-1,-1,0)") else entryRows).mkString(",")
    hnswSearchSql(model, dim, k, ef,
      extraCtes = "",
      entriesCte = s"""entries AS (SELECT sh::INTEGER AS shard, e::BIGINT AS ep,
                           el::INTEGER AS eplvl
                    FROM (VALUES $entryVals) t(sh, e, el))""",
      walkSeed = """SELECT q.qid, e.shard, e.eplvl, e.ep, -d.s
          FROM q CROSS JOIN entries e
          JOIN qd d ON d.qid = q.qid AND d.node = e.ep""")
  }

  /** Routed-HNSW oracle: [[hnswOracle]]'s embedded-graph search with the
    * ROUTING independently re-derived too — the centroid matrix rides as
    * literals (the [[ivfAssignCte]] seam) and a routing CTE applies the
    * IVF probe rule (dot over normalized queries DESC, ties toward the
    * lower cell, top nProbeCells); the walk then seeds one descent per
    * (query, entry point of a routed cell's sub-shard) instead of the
    * full `q CROSS JOIN entries` fan-out. Graph membership (which ids
    * landed in which sub-shard) is part of the trained artifact, exactly
    * like adjacency — the oracle re-derives every DECISION (routing,
    * descent, beam, re-rank) from raw vectors + artifact literals.
    */
  private def hnswRoutedOracle(
      model: Ann.HnswRoutedDump, dim: Int, k: Int, ef: Int,
      nProbeCells: Int, corpusWhere: String = "TRUE"): String = {
    val centsValues = centroidValuesSql(model.cents)
    val entryRows = model.dumps.zip(model.shardCells).collect {
      case (d, cell) if d.entryId >= 0 =>
        s"(${d.shard},$cell,${d.entryId},${d.entryLevel})"
    }
    val entryVals =
      (if (entryRows.isEmpty) Array("(-1,-1,-1,0)") else entryRows).mkString(",")
    hnswSearchSql(model.dumps, dim, k, ef,
      extraCtes = s"""rcents(cell, w) AS (VALUES $centsValues),
        rscore AS (SELECT q.qid, c.cell,
                     list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(generate_series(1, $dim),
                         i -> q.qv[i] * c.w[i])), (x, y) -> x + y) AS dt
                   FROM q CROSS JOIN rcents c),
        routed AS (SELECT qid, cell FROM (SELECT qid, cell,
                     ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY dt DESC, cell) AS r
                   FROM rscore) WHERE r <= $nProbeCells),""",
      entriesCte = s"""entries AS (SELECT sh::INTEGER AS shard, cl::INTEGER AS cell,
                           e::BIGINT AS ep, el::INTEGER AS eplvl
                    FROM (VALUES $entryVals) t(sh, cl, e, el))""",
      walkSeed = """SELECT q.qid, e.shard, e.eplvl, e.ep, -d.s
          FROM q JOIN routed r ON r.qid = q.qid
          JOIN entries e ON e.cell = r.cell
          JOIN qd d ON d.qid = q.qid AND d.node = e.ep""",
      corpusWhere = corpusWhere)
  }

  /** The shared HNSW search re-derivation (see [[hnswOracle]]'s proof
    * sketch): normalization, the (query, node) dot matrix, greedy descent,
    * the ef-bounded batch beam, per-shard top-k, exact re-rank. Callers
    * supply the entry-point relation and the walk seed (full fan-out vs
    * routed), plus any CTEs those need — ONE copy of the recursive search
    * so the beam semantics cannot drift between the two gates.
    */
  private def hnswSearchSql(
      model: Array[Ann.HnswShardDump], dim: Int, k: Int, ef: Int,
      extraCtes: String, entriesCte: String, walkSeed: String,
      corpusWhere: String = "TRUE"): String = {
    // the served-corpus predicate (maintenance gates): applied in the vn
    // CTE so filtered rows neither ask (q) nor answer (qd candidates);
    // "TRUE" emits byte-identical SQL to the pre-r18.5 oracles, keeping
    // the SQL-keyed timing cache and the sibling gates' text unchanged
    val corpusSrc =
      if (corpusWhere == "TRUE") "embeddings"
      else s"embeddings WHERE $corpusWhere"
    val stp = "STRUCT(negs DOUBLE, id BIGINT)[]"
    // degenerate dumps (empty corpus, or 1-node shards with no links) must
    // still yield WELL-FORMED SQL: a sentinel row that joins nothing
    // (node/shard -1 never appears in the data) keeps the VALUES lists
    // non-empty without changing any result
    val adjRows = model.flatMap(_.adjacency.collect {
      case (node, lvl, nbrs) if nbrs.nonEmpty =>
        s"($node,$lvl,[${nbrs.mkString(",")}])"
    })
    val adjVals =
      (if (adjRows.isEmpty) Array("(-1,0,[-1])") else adjRows).mkString(",")
    s"""WITH RECURSIVE
        adjl AS (SELECT n::BIGINT AS node, l::INTEGER AS lvl,
                        list_transform(ns, z -> z::BIGINT) AS nbrs
                 FROM (VALUES $adjVals) t(n, l, ns)),
        $entriesCte,
        vn AS (SELECT id, CASE WHEN nn = 0 THEN v
                               ELSE list_transform(v, x -> x / nn) END AS vn
               FROM (SELECT id, v, SQRT(list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(generate_series(1, $dim),
                         i -> v[i] * v[i])), (x, y) -> x + y)) AS nn
                     FROM (SELECT vec_id AS id,
                             list_transform(embedding, x -> x::DOUBLE) AS v
                           FROM $corpusSrc))),
        q AS (SELECT id AS qid, vn AS qv FROM vn WHERE id < 20),
        $extraCtes
        qd AS (SELECT q.qid, c.id AS node,
                 list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(generate_series(1, $dim),
                     i -> q.qv[i] * c.vn[i])), (x, y) -> x + y) AS s
               FROM q CROSS JOIN vn c),
        adjx AS (SELECT node, lvl, unnest(nbrs) AS nbr,
                        unnest(generate_series(1, len(nbrs))) AS pos
                 FROM adjl),
        adjq AS (SELECT x.node, x.lvl, d.qid,
                   list(struct_pack(negs := -d.s, id := x.nbr)
                        ORDER BY x.pos) AS snbrs
                 FROM adjx x JOIN qd d ON d.node = x.nbr
                 GROUP BY x.node, x.lvl, d.qid),
        walk(qid, shard, lvl, cur, curnegs) AS (
          $walkSeed
          UNION ALL
          SELECT qid, shard,
                 CASE WHEN best.id = cur THEN lvl - 1 ELSE lvl END,
                 best.id, best.negs
          FROM (SELECT w.qid, w.shard, w.lvl, w.cur,
                  (list_sort(
                    list_prepend(struct_pack(negs := w.curnegs, id := w.cur),
                                 coalesce(a.snbrs, []::$stp))))[1] AS best
                FROM walk w LEFT JOIN adjq a
                  ON a.qid = w.qid AND a.node = w.cur AND a.lvl = w.lvl
                WHERE w.lvl > 0)),
        beam(qid, shard, done, vis, cand, res) AS (
          SELECT w.qid, w.shard, false, [w.cur],
                 [struct_pack(negs := w.curnegs, id := w.cur)],
                 [struct_pack(negs := w.curnegs, id := w.cur)]
          FROM walk w WHERE w.lvl = 0
          UNION ALL
          SELECT qid, shard, term,
            CASE WHEN term THEN vis
                 ELSE vis || list_transform(unv, u -> u.id) END,
            CASE WHEN term THEN []::$stp ELSE list_sort(rest || unv) END,
            CASE WHEN term THEN res
                 ELSE list_slice(list_sort(res || unv), 1, $ef) END
          FROM (SELECT b.qid, b.shard, b.vis, b.res,
                  (len(b.cand) = 0 OR (len(b.res) >= $ef
                     AND b.cand[1].negs > b.res[len(b.res)].negs)) AS term,
                  list_filter(coalesce(a.snbrs, []::$stp),
                              x -> NOT list_contains(b.vis, x.id)) AS unv,
                  list_slice(b.cand, 2, len(b.cand)) AS rest
                FROM beam b LEFT JOIN adjq a
                  ON a.qid = b.qid AND a.lvl = 0
                 AND a.node = b.cand[1].id
                WHERE NOT b.done)),
        fin AS (SELECT qid,
                  unnest(list_slice(list_filter(res, x -> x.id <> qid),
                                    1, $k)) AS c
                FROM beam WHERE done),
        cand2 AS (SELECT qid AS query_id,
                         struct_extract(c, 'id') AS neighbor_id FROM fin),
        sc AS (
          SELECT cand2.query_id, cand2.neighbor_id,
            ${dot("eq.embedding", "ec.embedding")} /
              (SQRT(${dot("eq.embedding", "eq.embedding")}) *
               SQRT(${dot("ec.embedding", "ec.embedding")})) AS cos
          FROM cand2
          JOIN embeddings eq ON eq.vec_id = cand2.query_id
          JOIN embeddings ec ON ec.vec_id = cand2.neighbor_id
          WHERE ${dot("eq.embedding", "eq.embedding")} > 0
            AND ${dot("ec.embedding", "ec.embedding")} > 0
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
               FLOOR(cos * 10000.0 + 0.5) / 10000.0 AS score
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank FROM sc)
        WHERE rank <= $k ORDER BY query_id, rank"""
  }

  private def ivfOracle(cents: Array[Array[Double]], nProbe: Int, k: Int): String = {
    s"""WITH ${ivfAssignCte(cents)}, probes AS (
          SELECT id, cell FROM (SELECT id, cell,
              ROW_NUMBER() OVER (PARTITION BY id ORDER BY dt DESC, cell) AS r
            FROM cellscore WHERE id < 20) WHERE r <= $nProbe
        ), s AS (
          SELECT p.id AS query_id, a.id AS neighbor_id,
            ${dot("q.embedding", "c.embedding")} / (q.n * c.n) AS cos
          FROM probes p JOIN assign a ON p.cell = a.cell AND p.id <> a.id
          JOIN emb q ON q.id = p.id
          JOIN emb c ON c.id = a.id
          WHERE q.n > 0 AND c.n > 0
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
               FLOOR(cos * 10000.0 + 0.5) / 10000.0 AS score
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank FROM s)
        WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** IVF-PQ oracle: the embedded-literal trick applied to BOTH quantizer
    * layers. Centroids ride [[ivfAssignCte]]; codebooks become a
    * (sub, code, bw) literal relation. DuckDB then independently:
    *   1. assigns every corpus vector its cell (shared CTE) and its m
    *      one-byte codes — per-subspace L2 argmin over the residual,
    *      `(u[pos]−cw[pos])−bw[i]` squared in the SAME operation order as
    *      the Scala kernel, ties to the lower code;
    *   2. probes nProbe cells per query (dt DESC, cell — the coarse rule);
    *   3. scores the ADC approximation with the EXACT fold order of the
    *      Scala probe (celldot seeded first, then the per-subspace LUT
    *      dots in ascending sub — `list_prepend(dt, list(... ORDER BY
    *      sub))` reduced left-to-right, bit-reproducible), shortlists the
    *      per-query top candidateFactor·k by (approx DESC, neighbor_id);
    *   4. re-ranks survivors with the exact cosine (zero-norm rows
    *      excluded, the ann_cosine contract).
    */
  private def ivfPqOracle(
      model: Ann.PqModel, nProbe: Int, k: Int, candidateFactor: Int): String = {
    val sd = model.subDim
    val booksValues = (for {
      sub <- model.codebooks.indices
      code <- model.codebooks(sub).indices
    } yield s"($sub,$code,[${model.codebooks(sub)(code).map(_.toString).mkString(",")}])")
      .mkString(",")
    s"""WITH ${ivfAssignCte(model.cents)},
        books(sub, code, bw) AS (VALUES $booksValues),
        res AS (
          SELECT nv.id, nv.u, c.w AS cw, a.cell
          FROM nv JOIN assign a ON a.id = nv.id JOIN cents c ON c.cell = a.cell
        ),
        coded AS (
          SELECT id, cell, sub, code FROM (
            SELECT r.id, r.cell, b.sub, b.code,
              ROW_NUMBER() OVER (PARTITION BY r.id, b.sub ORDER BY
                list_reduce(list_prepend(0.0, list_transform(generate_series(1, $sd),
                  i -> ((r.u[b.sub*$sd + i] - r.cw[b.sub*$sd + i]) - b.bw[i])
                     * ((r.u[b.sub*$sd + i] - r.cw[b.sub*$sd + i]) - b.bw[i]))),
                  (x, y) -> x + y) ASC, b.code ASC) AS rk
            FROM res r CROSS JOIN books b) WHERE rk = 1
        ),
        probes AS (
          SELECT id, cell, dt FROM (SELECT id, cell, dt,
              ROW_NUMBER() OVER (PARTITION BY id ORDER BY dt DESC, cell) AS r
            FROM cellscore WHERE id < 20) WHERE r <= $nProbe
        ),
        adc AS (
          SELECT p.id AS query_id, cd.id AS neighbor_id,
            list_reduce(list_prepend(p.dt, list(
              list_reduce(list_prepend(0.0, list_transform(generate_series(1, $sd),
                i -> q.u[cd.sub*$sd + i] * b.bw[i])), (x, y) -> x + y)
              ORDER BY cd.sub)), (x, y) -> x + y) AS approx
          FROM probes p
          JOIN nv q ON q.id = p.id
          JOIN coded cd ON cd.cell = p.cell AND cd.id <> p.id
          JOIN books b ON b.sub = cd.sub AND b.code = cd.code
          GROUP BY p.id, cd.id, p.dt
        ),
        cand AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY approx DESC, neighbor_id) AS arank
            FROM adc) WHERE arank <= ${k * candidateFactor}
        ),
        s AS (
          SELECT cand.query_id, cand.neighbor_id,
            ${dot("q.embedding", "c.embedding")} / (q.n * c.n) AS cos
          FROM cand JOIN emb q ON q.id = cand.query_id
          JOIN emb c ON c.id = cand.neighbor_id
          WHERE q.n > 0 AND c.n > 0
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
               FLOOR(cos * 10000.0 + 0.5) / 10000.0 AS score
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank FROM s)
        WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** IVF-bucketed cosine-pair oracle: embedded centroids, top-`nProbe`
    * multi-assignment over EVERY vector, distinct same-cell (a < b)
    * candidates, exact cosine verify with the brute tier's arithmetic
    * (zero-norm rows excluded — the Scala side filters them before
    * assignment). The full candidate rule is replicated, so equality is
    * exact regardless of the bucketing's recall.
    */
  private def cosinePairsIvfOracle(
      cents: Array[Array[Double]], nProbe: Int, threshold: Double,
      candWhere: String = ""): String =
    s"""WITH ${ivfAssignCte(cents)}, an AS (
          SELECT id, cell FROM (SELECT id, cell,
              ROW_NUMBER() OVER (PARTITION BY id ORDER BY dt DESC, cell) AS r
            FROM cellscore) WHERE r <= $nProbe
        ), cand AS (
          SELECT DISTINCT x.id AS ida, y.id AS idb
          FROM an x JOIN an y ON x.cell = y.cell AND x.id < y.id$candWhere
        ), s AS (
          SELECT ida AS a, idb AS b,
            ${dot("q.embedding", "c.embedding")} / (q.n * c.n) AS cos
          FROM cand JOIN emb q ON q.id = cand.ida
          JOIN emb c ON c.id = cand.idb
          WHERE q.n > 0 AND c.n > 0
        )
        SELECT a, b, FLOOR(cos * 10000.0 + 0.5) / 10000.0 AS score
        FROM s WHERE cos >= $threshold ORDER BY a, b"""

  /** cur_semantic_ivf oracle: quality gate, assignment CTE over the KEPT
    * embedding subset with the embedded (kept-trained) centroids,
    * top-`nProbe` multi-assignment, distinct same-cell (a < b) candidate
    * pairs, exact cosine verify, then drop every pair's max id from the
    * kept set. The FULL candidate rule is replicated, so hash-equality is
    * exact regardless of the bucketing's recall.
    */
  private def semanticIvfOracle(cents: Array[Array[Double]], nProbe: Int,
      threshold: Double, minQuality: Double): String =
    s"""WITH kept AS (
          SELECT * FROM (
            SELECT doc_id, lang, $qualitySql AS quality FROM documents) q
          WHERE quality >= $minQuality
        ), ${ivfAssignCte(cents,
            "WHERE vec_id IN (SELECT doc_id FROM kept)")}, an AS (
          SELECT id, cell FROM (SELECT id, cell,
              ROW_NUMBER() OVER (PARTITION BY id ORDER BY dt DESC, cell) AS r
            FROM cellscore) WHERE r <= $nProbe
        ), cand AS (
          SELECT DISTINCT x.id AS ida, y.id AS idb
          FROM an x JOIN an y ON x.cell = y.cell AND x.id < y.id
        ), drops AS (
          SELECT DISTINCT cand.idb AS doc_id
          FROM cand JOIN emb q ON q.id = cand.ida
          JOIN emb c ON c.id = cand.idb
          WHERE q.n > 0 AND c.n > 0
            AND ${dot("q.embedding", "c.embedding")} / (q.n * c.n)
                >= $threshold
        )
        SELECT doc_id, lang, quality FROM kept
        WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        ORDER BY doc_id"""

  /** Cluster-balanced curation oracle: same assignment CTE, then top-`n`
    * docs per cell by (quality desc, id).
    */
  private def diverseOracle(cents: Array[Array[Double]], n: Int): String =
    s"""WITH ${ivfAssignCte(cents)}, q AS (
          SELECT doc_id, $qualitySql AS quality FROM documents
        )
        SELECT doc_id, CAST(cell AS INTEGER) AS cell, quality
        FROM (SELECT a.id AS doc_id, a.cell, q.quality,
                ROW_NUMBER() OVER (PARTITION BY a.cell
                  ORDER BY q.quality DESC, a.id) AS rk
              FROM assign a JOIN q ON q.doc_id = a.id)
        WHERE rk <= $n ORDER BY doc_id"""

  /** Static oracles plus the data-dependent entries (present once a query
    * has trained the centroids in this JVM — Verify runs every query
    * before the dump).
    */
  def oracles: Map[String, String] = {
    // dd_canonical_routed hash-matches the SAME oracle as dd_canonical:
    // the three-stage route is an execution strategy, not a semantics
    // change, so the correctness bar is literal output equality
    val base = staticOracles +
      ("dd_canonical_routed" -> staticOracles("dd_canonical")) +
      ("dd_canonical_auto" -> staticOracles("dd_canonical")) +
      ("dd_components_routed" -> staticOracles("dd_components")) +
      ("dd_components_auto" -> staticOracles("dd_components")) +
      // auto picks the exact brute branch below the kept-embedding
      // cutover — true at every gate SF (691 kept at sf0.1 vs 10k), so
      // the gate hash-checks that branch against the brute oracle; the
      // spec forces and checks BOTH branches via the cutover knob
      ("cur_semantic_auto" -> staticOracles("cur_semantic"))
    val withIvf = Option(ivfTrainedCentroids.get()) match {
      case Some(cents) => base +
        ("ann_ivf_topk" -> ivfOracle(cents, nProbe = 4, k = 5)) +
        ("cur_diverse" -> diverseOracle(cents, n = 20))
      case None        => base
    }
    val withPq = Option(pqTrainedModel.get()) match {
      case Some(model) => withIvf +
        ("ann_ivfpq_topk" -> ivfPqOracle(model, nProbe = 4, k = 5,
          candidateFactor = 8))
      case None        => withIvf
    }
    val withHnsw = Option(hnswModel.get()) match {
      case Some(model) => withPq +
        ("ann_hnsw_topk" -> hnswOracle(model, dim = 64, k = 5, ef = 64))
      case None        => withPq
    }
    val withHnswRouted = Option(hnswRoutedModel.get()) match {
      case Some(model) => withHnsw +
        ("ann_hnsw_routed" -> hnswRoutedOracle(model, dim = 64, k = 5,
          ef = 64, nProbeCells = 4)) +
        // the standing index serves the SAME relation from persisted
        // graphs (equality spec-pinned), so the routed oracle checks it
        ("ann_hnsw_index" -> hnswRoutedOracle(model, dim = 64, k = 5,
          ef = 64, nProbeCells = 4)) +
        // …and the INCREMENTALLY MAINTAINED index is bit-identical to the
        // fresh build (insert's equality contract), so the same oracle
        // checks build-then-insert too
        ("ann_hnsw_index_inc" -> hnswRoutedOracle(model, dim = 64, k = 5,
          ef = 64, nProbeCells = 4))
      case None        => withHnsw
    }
    // the auto gate's oracle re-derives the branch the decision took
    // (see the hnswAutoRouted stash note)
    val withHnswAuto = Option(hnswAutoRouted.get()) match {
      case Some(routed) =>
        val sqlOpt =
          if (routed.booleanValue())
            Option(hnswRoutedModel.get())
              .map(m => hnswRoutedOracle(m, dim = 64, k = 5, ef = 64,
                nProbeCells = 4))
          else Option(hnswModel.get())
            .map(m => hnswOracle(m, dim = 64, k = 5, ef = 64))
        sqlOpt.fold(withHnswRouted)(sql =>
          withHnswRouted + ("ann_hnsw_auto" -> sql))
      case None => withHnswRouted
    }
    // the compact gate's oracle: the surviving-corpus graphs at the
    // full-corpus centroids, with the tombstone predicate filtering the
    // corpus CTE (removed rows neither ask nor answer)
    val withHnswCompact = Option(hnswCompactModel.get()) match {
      case Some(model) => withHnswAuto +
        ("ann_hnsw_index_compact" -> hnswRoutedOracle(model, dim = 64,
          k = 5, ef = 64, nProbeCells = 4,
          corpusWhere = "(vec_id % 5) <> 3"))
      case None => withHnswAuto
    }
    val withIvfPairs = Option(ivfPairCents.get()) match {
      case Some(cents) => withHnswCompact +
        ("dd_cosine_neardup_ivf" -> cosinePairsIvfOracle(cents,
          nProbe = 2, threshold = 0.4))
      case None        => withHnswCompact
    }
    val withIncPairs = Option(ivfIncCents.get()) match {
      case Some(cents) => withIvfPairs +
        ("dd_cosine_neardup_inc" -> cosinePairsIvfOracle(cents,
          nProbe = 2, threshold = 0.4,
          candWhere = " AND (x.id >= 400 OR y.id >= 400)"))
      case None        => withIvfPairs
    }
    val withSemIvf = Option(semanticIvfCents.get()) match {
      case Some(cents) => withIncPairs +
        ("cur_semantic_ivf" -> semanticIvfOracle(cents,
          nProbe = 4, threshold = 0.4, minQuality = 0.4))
      case None        => withIncPairs
    }
    val withBpe = Option(bpeTrained.get()) match {
      case Some(tr) if tr.complete => withSemIvf +
        ("tx_bpe_encode" -> bpeOracle(tr)) +
        ("sm_pack_bpe" -> bpePackOracle(tr))
      case _                       => withSemIvf
    }
    val withQc = Option(classifierWeights.get()) match {
      case Some(w) => withBpe + ("tx_quality_classifier" -> classifierOracle(w))
      case None    => withBpe
    }
    val withIr = Option(bm25State.get()) match {
      case Some((idfs, avgdl)) => withQc + ("ir_bm25_topk" -> bm25Oracle(idfs, avgdl))
      case None                => withQc
    }
    val withBatch = Option(batchBm25State.get()) match {
      case Some((idfs, avgdl)) =>
        withIr + ("ir_batch_bm25" -> batchBm25Oracle(idfs, avgdl))
      case None => withIr
    }
    Option(quantileSketchState.get()) match {
      case Some(rows) if rows.nonEmpty =>
        withBatch + ("tx_quantiles_sketch" -> quantilesSketchOracle(rows))
      case _ => withBatch
    }
  }

  private val staticOracles: Map[String, String] = Map(
    "cur_corpus_report" ->
      s"""WITH q AS (SELECT source, lang,
            len($tokensSql) AS n_toks, $qualitySql AS q
          FROM documents)
          SELECT source, lang,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
            CAST(FLOOR(CAST(SUM(CAST(FLOOR(q * 10000.0 + 0.5) AS BIGINT))
                 AS DOUBLE) / COUNT(*)) AS BIGINT) AS mean_quality_e4,
            CAST(SUM(CASE WHEN q < 0.4 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_low_quality
          FROM q GROUP BY source, lang ORDER BY source, lang""",

    "tx_chunk_docs" ->
      s"""WITH toks AS (SELECT doc_id, $tokensSql AS w FROM documents),
          st AS (SELECT doc_id, w,
                   unnest(generate_series(0, len(w) - 1, 48)) AS start
                 FROM toks WHERE len(w) > 0)
          SELECT doc_id, CAST(start / 48 AS INTEGER) AS chunk_idx,
                 CAST(len(w[start + 1 : start + 64]) AS INTEGER) AS n_chunk_tokens,
                 array_to_string(w[start + 1 : start + 64], ' ') AS chunk_text
          FROM st ORDER BY doc_id, chunk_idx""",

    "ann_quantize_int8" ->
      """WITH e AS (SELECT vec_id, embedding,
            list_max(list_transform(embedding,
              x -> abs(CAST(x AS DOUBLE)))) AS m
          FROM embeddings)
          SELECT vec_id,
            CAST(FLOOR(m / 127.0 * 1000000000.0 + 0.5) AS BIGINT) AS scale_e9,
            CASE WHEN m = 0
              THEN array_to_string(list_transform(embedding, x -> '0'), ',')
              ELSE array_to_string(list_transform(embedding,
                x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / m + 0.5)
                     AS INTEGER) AS VARCHAR)), ',') END AS q_csv
          FROM e ORDER BY vec_id""",

    "ir_term_stats" -> {
      val branches = Retrieval.QueryTerms.map { t =>
        s"""SELECT '$t' AS term,
            len(list_filter(w, x -> x = '$t')) AS tf FROM toks"""
      }.mkString(" UNION ALL ")
      s"""WITH toks AS (SELECT $tokensSql AS w FROM documents),
          tf AS ($branches)
          SELECT term,
                 CAST(SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df,
                 CAST(SUM(tf) AS BIGINT) AS cf
          FROM tf GROUP BY term ORDER BY term"""
    },

    "tx_token_count" ->
      s"""SELECT doc_id, CAST(len($tokensSql) AS INTEGER) AS n_ws,
          CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS INTEGER) AS n_re
          FROM documents ORDER BY doc_id""",

    "tx_quality_score" ->
      s"""SELECT doc_id, CAST(len($tokensSql) AS INTEGER) AS n_tokens,
          $qualitySql AS quality
          FROM documents ORDER BY doc_id""",

    "tx_lang_id" -> {
      val hits = TextOps.langProfiles.map { case (lang, words) =>
        val lst = words.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> list_contains([$lst], t))) AS ${lang}_hits"
      }.mkString(",\n             ")
      val langs = TextOps.langProfiles.map(_._1)
      val best = s"GREATEST(${langs.map(_ + "_hits").mkString(", ")})"
      val cases = langs.map(l => s"WHEN ${l}_hits = $best THEN '$l'").mkString(" ")
      s"""SELECT doc_id, lang,
            CASE WHEN $best <= 0 THEN 'unknown' $cases ELSE 'unknown' END AS lang_pred
          FROM (SELECT doc_id, lang, text, $hits FROM documents)
          ORDER BY doc_id"""
    },

    "tx_fingerprint" ->
      s"""SELECT doc_id, ${ph("text", 31)} AS fp FROM documents ORDER BY doc_id""",

    "tx_filter_quality" ->
      s"""SELECT * FROM (SELECT doc_id, lang, $qualitySql AS quality
          FROM documents) t
          WHERE quality >= 0.4
          ORDER BY doc_id""",

    "tx_repetition" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS w FROM documents),
          bg AS (
            SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
              i -> w[i] || ' ' || w[i+1])) AS b
            FROM t
          ),
          bgc AS (
            SELECT doc_id, MAX(c) AS mx FROM (
              SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b) g
            GROUP BY doc_id
          )
          SELECT t.doc_id, CAST(len(w) AS INTEGER) AS n_tokens,
                 (len(w) - len(list_distinct(w))) / CAST(len(w) AS DOUBLE)
                   AS dup_token_frac,
                 COALESCE(mx / CAST(len(w) - 1 AS DOUBLE), 0.0)
                   AS top_bigram_frac
          FROM t LEFT JOIN bgc ON t.doc_id = bgc.doc_id
          ORDER BY t.doc_id""",

    "tx_top_ngrams" ->
      s"""SELECT b AS bigram, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT unnest(list_transform(generate_series(1, len(w)-1),
              i -> w[i] || ' ' || w[i+1])) AS b
            FROM (SELECT $tokensSql AS w FROM documents) t) g
          GROUP BY b ORDER BY cnt DESC, b LIMIT 20""",

    "sm_temperature" ->
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
         d AS (SELECT list_reduce(list_prepend(0.0, list_sort(list(sqrt(n::DOUBLE)))),
                        (a, b) -> a + b) AS denom,
                      CAST(SUM(n) AS BIGINT) AS total FROM c),
         r AS (SELECT c.source,
                 CAST(LEAST(1000000, FLOOR(1000000.0 * (d.total::DOUBLE / 4.0) *
                   sqrt(c.n::DOUBLE) / d.denom / c.n::DOUBLE)) AS BIGINT) AS thr
               FROM c CROSS JOIN d)
         SELECT doc_id, source, r.thr AS thr
         FROM documents JOIN r USING(source)
         WHERE ((doc_id % 1000000007) * 2654435761) % 1000000007 % 1000000 < r.thr
         ORDER BY doc_id""",

    // integer-exact throughout: budget, target, and threshold divisions
    // all floor on values << 2^52, so Spark's double-division floor and
    // DuckDB's integer // agree exactly
    "sm_mixture" ->
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                    1 + (ascii(right(source, 1)) % 5) AS wraw
                FROM documents GROUP BY 1),
         d AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                      CAST(SUM(wraw) AS BIGINT) AS wsum FROM c),
         r AS (SELECT c.source,
                 LEAST(1000000, ((d.total // 2) * c.wraw // d.wsum) * 1000000 // c.n) AS thr
               FROM c CROSS JOIN d)
         SELECT doc_id, source, r.thr AS thr
         FROM documents JOIN r USING (source)
         WHERE ((doc_id % 1000000007) * 2654435761) % 1000000007 % 1000000 < r.thr
         ORDER BY doc_id""",

    "sm_temperature_epochs" ->
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
         d AS (SELECT list_reduce(list_prepend(0.0, list_sort(list(sqrt(n::DOUBLE)))),
                        (a, b) -> a + b) AS denom,
                      CAST(SUM(n) AS BIGINT) AS total FROM c),
         r AS (SELECT c.source,
                 CAST(FLOOR(1000000.0 * d.total::DOUBLE * sqrt(c.n::DOUBLE)
                   / d.denom / c.n::DOUBLE) AS BIGINT) AS rate1e6
               FROM c CROSS JOIN d),
         a AS (SELECT doc_id, source,
                 (r.rate1e6 // 1000000) +
                 (CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 1000000
                         < r.rate1e6 % 1000000 THEN 1 ELSE 0 END) AS n_copies
               FROM documents JOIN r USING (source))
         SELECT * FROM (
           SELECT doc_id, source, unnest(generate_series(1, n_copies)) AS copy
           FROM a WHERE n_copies > 0)
         ORDER BY doc_id, copy""",

    "tx_perplexity" ->
      s"""WITH toks AS (SELECT doc_id, $tokensSql AS w FROM documents),
          uni AS (SELECT u AS w1, CAST(COUNT(*) AS BIGINT) AS c1
                  FROM (SELECT unnest(w) AS u FROM toks) GROUP BY 1),
          v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
          bi AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                   i -> w[i] || ' ' || w[i+1])) AS b FROM toks),
          bc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c12 FROM bi GROUP BY 1),
          scored AS (
            SELECT bi.doc_id,
              CAST(FLOOR(-ln((bc.c12 + 1)::DOUBLE / (uni.c1 + v.v)::DOUBLE)
                * 10000.0 + 0.5) AS BIGINT) AS t
            FROM bi JOIN bc USING(b)
            JOIN uni ON uni.w1 = string_split(bi.b, ' ')[1]
            CROSS JOIN v
          )
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 CAST(FLOOR(SUM(t)::DOUBLE / COUNT(*)::DOUBLE) AS BIGINT) AS avg_nll_e4
          FROM scored GROUP BY doc_id ORDER BY doc_id""",

    "sm_hash_split" ->
      """SELECT doc_id,
           CAST(((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 AS INTEGER) AS bucket,
           CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 90 THEN 'train'
                WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 95 THEN 'validation'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",

    "dd_normalized" ->
      """SELECT min(doc_id) AS rep_doc_id, CAST(count(*) AS BIGINT) AS n_dups,
           CAST(length(nt) AS INTEGER) AS norm_len
         FROM (SELECT doc_id,
                 trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS nt
               FROM documents) t
         GROUP BY nt ORDER BY rep_doc_id""",

    "tx_length_quantiles" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
            FLOOR(quantile_cont(n, 0.25) * 10000.0 + 0.5) / 10000.0 AS p25,
            FLOOR(quantile_cont(n, 0.5)  * 10000.0 + 0.5) / 10000.0 AS p50,
            FLOOR(quantile_cont(n, 0.75) * 10000.0 + 0.5) / 10000.0 AS p75,
            FLOOR(avg(n) * 10000.0 + 0.5) / 10000.0 AS mean_tokens
          FROM (SELECT lang, CAST(len($tokensSql) AS DOUBLE) AS n FROM documents) t
          GROUP BY lang ORDER BY lang""",

    "sm_stratified" ->
      """SELECT doc_id, lang,
           CAST(((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 AS INTEGER) AS bucket
         FROM documents
         WHERE ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100
               < CASE WHEN lang = 'en' THEN 20 ELSE 60 END
         ORDER BY doc_id""",

    "sm_source_cap" ->
      """SELECT doc_id, source, CAST(rn AS INTEGER) AS rn FROM (
           SELECT doc_id, source,
                  ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           FROM documents) t
         WHERE rn <= 40 ORDER BY doc_id""",

    "sm_pack" ->
      s"""SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
            CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS running,
            CAST(FLOOR((SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n)
                 / 2048.0) AS BIGINT) AS pack_id
          FROM (SELECT doc_id, len($tokensSql) AS n FROM documents) t
          ORDER BY doc_id""",

    "cur_corpus" ->
      s"""WITH kept AS (
            SELECT * FROM (
              SELECT doc_id, lang, text, $qualitySql AS quality FROM documents) q
            WHERE quality >= 0.4
          ),
          canon AS (
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM (SELECT doc_id,
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS nt
                  FROM kept) s
            GROUP BY nt
          )
          SELECT k.doc_id, k.lang, CAST(c.n_dups AS BIGINT) AS n_dups,
                 CAST(len($tokensSql) AS INTEGER) AS n_tokens, k.quality
          FROM canon c JOIN kept k ON c.doc_id = k.doc_id
          ORDER BY k.doc_id""",

    "cur_semantic" ->
      s"""WITH kept AS (
            SELECT * FROM (
              SELECT doc_id, lang, $qualitySql AS quality FROM documents) q
            WHERE quality >= 0.4
          ),
          pairs AS (
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id IN (SELECT doc_id FROM kept)
              AND b.vec_id IN (SELECT doc_id FROM kept)
              AND ${dot("a.embedding", "b.embedding")} /
                  (SQRT(${dot("a.embedding", "a.embedding")}) *
                   SQRT(${dot("b.embedding", "b.embedding")})) >= 0.4
          )
          SELECT doc_id, lang, quality FROM kept
          WHERE doc_id NOT IN (SELECT b FROM pairs)
          ORDER BY doc_id""",

    // string-shingle form of the Spark side's 60-bit-hashed shingle join —
    // equivalent absent hash collisions, the same equivalence
    // dd_ngram_jaccard's green hash row already rests on
    "cur_decontaminate" -> decontaminateOracle,

    // the bloom variant is output-identical BY CONSTRUCTION (false
    // positives die in the exact verify join; false negatives are
    // impossible for inserted keys) — so it shares the exact oracle
    "cur_decontaminate_bloom" -> decontaminateOracle,

    "cur_pii_stats" ->
      s"""WITH pii AS ($piiInjectSql)
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '${TextOps.EmailPattern}')) AS INTEGER) AS n_email,
                 CAST(len(regexp_extract_all(text, '${TextOps.PhonePattern}')) AS INTEGER) AS n_phone,
                 CAST(len(regexp_extract_all(text, '${TextOps.Ipv4Pattern}')) AS INTEGER) AS n_ip,
                 (len(regexp_extract_all(text, '${TextOps.EmailPattern}')) +
                  len(regexp_extract_all(text, '${TextOps.PhonePattern}')) +
                  len(regexp_extract_all(text, '${TextOps.Ipv4Pattern}')) > 0) AS has_pii
          FROM pii ORDER BY doc_id""",

    "cur_pii_redact" ->
      s"""WITH pii AS ($piiInjectSql), red AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '${TextOps.EmailPattern}')) +
                        len(regexp_extract_all(text, '${TextOps.PhonePattern}')) +
                        len(regexp_extract_all(text, '${TextOps.Ipv4Pattern}')) AS INTEGER)
                     AS n_redacted,
                   regexp_replace(regexp_replace(regexp_replace(text,
                     '${TextOps.EmailPattern}', '<EMAIL>', 'g'),
                     '${TextOps.PhonePattern}', '<PHONE>', 'g'),
                     '${TextOps.Ipv4Pattern}', '<IP>', 'g') AS clean
            FROM pii
          )
          SELECT doc_id, n_redacted,
                 CAST(LENGTH(clean) AS INTEGER) AS clean_len,
                 CAST(${ph("clean", 31)} AS BIGINT) AS clean_fp
          FROM red ORDER BY doc_id""",

    "sm_shuffle" ->
      """SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY (doc_id*2654435761)%1000000007, doc_id)
             AS shuffle_pos
         FROM documents ORDER BY doc_id""",

    "sm_curriculum" ->
      s"""WITH q AS (
            SELECT doc_id, $qualitySql AS quality FROM documents
          ), b AS (
            SELECT doc_id, quality,
              CAST(LEAST(FLOOR(FLOOR(quality*10000.0+0.5)/1000.0), 9)
                   AS INTEGER) AS bucket,
              (doc_id*2654435761)%1000000007 AS hkey
            FROM q
          )
          SELECT doc_id, bucket, quality,
            ROW_NUMBER() OVER (ORDER BY bucket DESC, hkey, doc_id)
              AS curriculum_pos
          FROM b ORDER BY doc_id""",

    "cur_token_budget" ->
      s"""WITH q AS (
            SELECT doc_id, lang,
                   CAST(len($tokensSql) AS BIGINT) AS n_tokens,
                   $qualitySql AS quality
            FROM documents
          ), r AS (
            -- CAST: DuckDB's SUM(BIGINT) OVER returns HUGEINT (pandas
            -- float64/object) while Spark emits int64; the driver's value
            -- hash is dtype-sensitive (r7 regression). Mirrors sm_pack.
            SELECT *, CAST(SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id)
              AS BIGINT) AS cum_tokens FROM q
          )
          SELECT doc_id, lang, n_tokens, quality, cum_tokens
          FROM r WHERE cum_tokens <= 20000 ORDER BY doc_id""",

    "dd_ngram_jaccard" -> shingleCte,
    "dd_ppjoin" -> shingleCte, // df-ordered prefix join: identical pair set
    "dd_minhash_lsh" -> shingleCte, // LSH must find exactly the true pairs
    // incremental = the full pair set restricted to pairs touching the
    // new batch — the implementation never GENERATES old×old, the oracle
    // just filters them out
    "dd_incremental" -> shingleCteWhere(" AND (d1 >= 400 OR d2 >= 400)"),
    // compaction must equal recomputing the WHOLE pair table from scratch
    "dd_compaction" -> shingleCte,

    "cur_dedup_spans" ->
      s"""WITH toks AS (
            SELECT doc_id, $tokensSql AS w FROM documents
          ), t20 AS (
            SELECT doc_id, w FROM toks WHERE len(w) >= 20
          ), wins AS (
            SELECT doc_id, (s).i AS i, (s).h AS h FROM (
              SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-19),
                i -> {'i': i, 'h': ${ph("array_to_string(w[i:i+19], ' ')", 31)}})) AS s
              FROM t20) u
          ), hot AS (
            SELECT h FROM (
              SELECT h, count(DISTINCT doc_id) AS dc FROM wins GROUP BY h) t
            WHERE dc >= 2
          ), cov AS (
            SELECT DISTINCT doc_id, unnest(generate_series(i, i+19)) AS t
            FROM wins WHERE h IN (SELECT h FROM hot)
          ), kept AS (
            SELECT x.doc_id,
                   array_to_string(list(x.tok ORDER BY x.t), ' ') AS clean,
                   count(*) AS n_kept
            FROM (SELECT doc_id, unnest(generate_series(1, len(w))) AS t,
                         unnest(w) AS tok
                  FROM t20) x
            LEFT JOIN cov ON cov.doc_id = x.doc_id AND cov.t = x.t
            WHERE cov.t IS NULL
            GROUP BY x.doc_id
          )
          SELECT t20.doc_id,
                 CAST(len(w) AS INTEGER) AS n_tokens,
                 CAST(len(w) - coalesce(k.n_kept, 0) AS INTEGER) AS n_removed,
                 CAST(${ph("coalesce(k.clean, '')", 31)} AS BIGINT) AS clean_fp
          FROM t20 LEFT JOIN kept k ON k.doc_id = t20.doc_id
          ORDER BY t20.doc_id""",

    // maximal spans: islands over hot window starts (0-based to match
    // posexplode) — same-length windows merge iff the start gap <= 20
    "dd_maximal_spans" ->
      s"""WITH toks AS (
            SELECT doc_id, $tokensSql AS w FROM documents
          ), wins AS (
            SELECT doc_id, (s).i AS i, (s).h AS h FROM (
              SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-19),
                i -> {'i': i, 'h': ${ph("array_to_string(w[i:i+19], ' ')", 31)}})) AS s
              FROM toks WHERE len(w) >= 20) u
          ), hot AS (
            SELECT h FROM (
              SELECT h, count(DISTINCT doc_id) AS dc FROM wins GROUP BY h) t
            WHERE dc >= 2
          ), hw AS (
            SELECT doc_id, i - 1 AS i FROM wins WHERE h IN (SELECT h FROM hot)
          ), marks AS (
            SELECT doc_id, i,
                   CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i) > 20
                        THEN 1 ELSE 0 END AS brk
            FROM hw
          ), isl AS (
            SELECT doc_id, i,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY i) AS g
            FROM marks
          )
          SELECT doc_id, CAST(MIN(i) AS INTEGER) AS span_start,
                 CAST(MAX(i) + 19 AS INTEGER) AS span_end,
                 CAST(MAX(i) + 19 - MIN(i) + 1 AS INTEGER) AS span_tokens
          FROM isl GROUP BY doc_id, g ORDER BY doc_id, span_start""",

    "dd_dup_windows" ->
      s"""WITH toks AS (
            SELECT doc_id, $tokensSql AS w FROM documents
          ), wins AS (
            SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-19),
              i -> ${ph("array_to_string(w[i:i+19], ' ')", 31)})) AS h
            FROM toks WHERE len(w) >= 20
          ), hot AS (
            SELECT h FROM (
              SELECT h, count(DISTINCT doc_id) AS dc FROM wins GROUP BY h) t
            WHERE dc >= 2
          )
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
                 CAST(count(*) FILTER (h IN (SELECT h FROM hot)) AS BIGINT) AS n_dup,
                 FLOOR(count(*) FILTER (h IN (SELECT h FROM hot))
                   / count(*) * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
          FROM wins GROUP BY doc_id ORDER BY doc_id""",

    // same oracle as dd_components: the digest-collapsed path must land
    // on the identical component labelling.
    //
    // The cc recursion (here and in sm_split_leakage_safe, dd_components,
    // dd_canonical, dd_sim_components) is MIN-LABEL PROPAGATION, not the
    // old transitive closure: the closure accumulated (id, every reachable
    // smaller label), which on dup-heavy near-clique graphs is quadratic
    // in component size — dd_sim_components' twin spent 432 of 803 s in it
    // at sf0.1 and silently fell out of the bench denominator at the 120 s
    // cap (r15 verdict ask #5). The min-propagated variant adds at most
    // one new (dst, min-of-working-neighbors) row per node per iteration,
    // converging in ~diameter rounds (0.14 s on the same graph).
    // Equivalence (same final MIN(comp) per id) was differential-tested
    // against the closure on path/star/clique/random graphs incl. a
    // 499-diameter path; the UNION-distinct working-set semantics
    // guarantee the component minimum still reaches every node because a
    // (v, m) row propagates to v's neighbors the iteration after it first
    // appears, and rows are only ever node ids of the same component.
    "dd_jac_components" ->
      s"""WITH RECURSIVE pairs AS ($shingleCte),
          edges AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION ALL SELECT d2, d1 FROM pairs
          ),
          cc AS (
            SELECT DISTINCT src AS id, src AS comp FROM edges
            UNION
            SELECT e.dst AS id, MIN(LEAST(cc.comp, e.dst)) AS comp
            FROM cc JOIN edges e ON e.src = cc.id
            GROUP BY e.dst
          )
          SELECT id AS doc_id, MIN(comp) AS component
          FROM cc GROUP BY id ORDER BY doc_id""",

    // the recursive-CTE component labels + the hashBucket split rule over
    // the component id (doc_id for singletons) — sm_hash_split's CASE,
    // keyed on the cluster instead of the doc
    "sm_split_leakage_safe" ->
      s"""WITH RECURSIVE pairs AS ($shingleCte),
          edges AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION ALL SELECT d2, d1 FROM pairs
          ),
          cc AS (
            SELECT DISTINCT src AS id, src AS comp FROM edges
            UNION
            SELECT e.dst AS id, MIN(LEAST(cc.comp, e.dst)) AS comp
            FROM cc JOIN edges e ON e.src = cc.id
            GROUP BY e.dst
          ),
          comp AS (
            SELECT id AS doc_id, MIN(comp) AS component FROM cc GROUP BY id
          ),
          u AS (
            SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS unit
            FROM documents d LEFT JOIN comp c USING (doc_id)
          )
          SELECT doc_id, unit,
            CASE WHEN ((unit % 1000000007) * 2654435761) % 1000000007 % 100 < 90 THEN 'train'
                 WHEN ((unit % 1000000007) * 2654435761) % 1000000007 % 100 < 95 THEN 'validation'
                 ELSE 'test' END AS split
          FROM u ORDER BY doc_id""",

    "dd_components" ->
      s"""WITH RECURSIVE pairs AS ($shingleCte),
          edges AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION ALL SELECT d2, d1 FROM pairs
          ),
          cc AS (
            SELECT DISTINCT src AS id, src AS comp FROM edges
            UNION
            SELECT e.dst AS id, MIN(LEAST(cc.comp, e.dst)) AS comp
            FROM cc JOIN edges e ON e.src = cc.id
            GROUP BY e.dst
          )
          SELECT id AS doc_id, MIN(comp) AS component
          FROM cc GROUP BY id ORDER BY doc_id""",

    "dd_canonical" ->
      s"""WITH RECURSIVE pairs AS ($shingleCte),
          edges AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION ALL SELECT d2, d1 FROM pairs
          ),
          cc AS (
            SELECT DISTINCT src AS id, src AS comp FROM edges
            UNION
            SELECT e.dst AS id, MIN(LEAST(cc.comp, e.dst)) AS comp
            FROM cc JOIN edges e ON e.src = cc.id
            GROUP BY e.dst
          ),
          labels AS (SELECT id AS doc_id, MIN(comp) AS component
                     FROM cc GROUP BY id)
          SELECT doc_id, CAST(LENGTH(text) AS INTEGER) AS text_len
          FROM documents
          WHERE doc_id NOT IN (SELECT doc_id FROM labels WHERE doc_id <> component)
          ORDER BY doc_id""",

    "dd_simhash" ->
      s"""WITH toks AS (
            SELECT doc_id, unnest(list_distinct($tokensSql)) AS t FROM documents
          ), th AS (
            SELECT doc_id, ${ph("t", 31)} AS h1, ${ph("t", 131)} AS h2 FROM toks
          ), sig AS (
            SELECT doc_id, list(h1) AS h1s, list(h2) AS h2s FROM th GROUP BY doc_id
          )
          SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), b ->
            CASE WHEN list_sum(list_transform(
                CASE WHEN b < 30 THEN h1s ELSE h2s END, h ->
                CASE WHEN (h // (1::BIGINT << (CASE WHEN b < 30 THEN b ELSE b - 30 END))) % 2 = 1
                     THEN 1 ELSE -1 END)) > 0
                 THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
          FROM sig ORDER BY doc_id""",

    // the oracle is the brute-force pair join the pigeonhole banding
    // provably equals (bands > maxHamming ⇒ no qualifying pair is missed)
    "dd_hamming" ->
      s"""WITH toks AS (
            SELECT doc_id, unnest(list_distinct($tokensSql)) AS t FROM documents
          ), th AS (
            SELECT doc_id, ${ph("t", 31)} AS h1, ${ph("t", 131)} AS h2 FROM toks
          ), sig AS (
            SELECT doc_id, list(h1) AS h1s, list(h2) AS h2s FROM th GROUP BY doc_id
          ), sh AS (
          SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), b ->
            CASE WHEN list_sum(list_transform(
                CASE WHEN b < 30 THEN h1s ELSE h2s END, h ->
                CASE WHEN (h // (1::BIGINT << (CASE WHEN b < 30 THEN b ELSE b - 30 END))) % 2 = 1
                     THEN 1 ELSE -1 END)) > 0
                 THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
          FROM sig)
          SELECT a.doc_id AS d1, b.doc_id AS d2,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hd
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
          ORDER BY d1, d2""",

    // components over the brute-force simhash pair graph — same label
    // rule (min doc id) as dd_components' oracle
    "dd_sim_components" ->
      s"""WITH RECURSIVE toks AS (
            SELECT doc_id, unnest(list_distinct($tokensSql)) AS t FROM documents
          ), th AS (
            SELECT doc_id, ${ph("t", 31)} AS h1, ${ph("t", 131)} AS h2 FROM toks
          ), sig AS (
            SELECT doc_id, list(h1) AS h1s, list(h2) AS h2s FROM th GROUP BY doc_id
          ), sh AS (
          SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), b ->
            CASE WHEN list_sum(list_transform(
                CASE WHEN b < 30 THEN h1s ELSE h2s END, h ->
                CASE WHEN (h // (1::BIGINT << (CASE WHEN b < 30 THEN b ELSE b - 30 END))) % 2 = 1
                     THEN 1 ELSE -1 END)) > 0
                 THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
          FROM sig),
          pairs AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
          ),
          edges AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION ALL SELECT d2, d1 FROM pairs
          ),
          cc AS (
            SELECT DISTINCT src AS id, src AS comp FROM edges
            UNION
            SELECT e.dst AS id, MIN(LEAST(cc.comp, e.dst)) AS comp
            FROM cc JOIN edges e ON e.src = cc.id
            GROUP BY e.dst
          )
          SELECT id AS doc_id, MIN(comp) AS component
          FROM cc GROUP BY id ORDER BY doc_id""",

    "dd_cosine_neardup" ->
      s"""SELECT a.vec_id AS a, b.vec_id AS b,
            FLOOR(${dot("a.embedding", "b.embedding")} /
              (SQRT(${dot("a.embedding", "a.embedding")}) *
               SQRT(${dot("b.embedding", "b.embedding")})) * 10000.0 + 0.5) / 10000.0 AS score
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE ${dot("a.embedding", "b.embedding")} /
              (SQRT(${dot("a.embedding", "a.embedding")}) *
               SQRT(${dot("b.embedding", "b.embedding")})) >= 0.4
          ORDER BY a, b""",

    // LSH oracle: the deterministic hyperplane matrix (64 planes × 64 dims,
    // Ann.planeComponent) embedded as literal DOUBLE[] rows — Double.toString
    // emits the shortest decimal that round-trips, and DuckDB's parser
    // rounds-to-nearest, so both engines see bit-identical planes. The
    // signature fold (list_prepend(0.0, …) + left-to-right reduce) mirrors
    // the UDF's `var dot = 0.0; dot += v(j)*plane(j)` exactly, and the
    // candidate set is DISTINCT pairs sharing any (table, signature) cell —
    // the same OR-amplification as lshTopK. Exact re-scoring and ranking
    // are the ann_cosine oracle verbatim.
    "ann_lsh_topk" ->
      s"""WITH planes(pg, w) AS (VALUES ${lshPlanesValues(8, 8, 64)}),
          sigs AS (
            SELECT e.vec_id AS id, pg // 8 AS t,
                   CAST(SUM(CASE WHEN list_reduce(list_prepend(0.0,
                       list_transform(generate_series(1, 64),
                         i -> e.embedding[i]::DOUBLE * w[i])),
                       (x, y) -> x + y) > 0
                     THEN (1::BIGINT << (pg % 8)) ELSE 0 END) AS BIGINT) AS sig
            FROM embeddings e CROSS JOIN planes
            GROUP BY 1, 2
          ),
          cand AS (
            SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id
            FROM sigs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig AND q.id <> c.id
            WHERE q.id < 20
          ),
          s AS (
            SELECT cand.query_id, cand.neighbor_id,
              ${dot("q.embedding", "c.embedding")} /
                (SQRT(${dot("q.embedding", "q.embedding")}) *
                 SQRT(${dot("c.embedding", "c.embedding")})) AS cos
            FROM cand
            JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.neighbor_id
            WHERE ${dot("q.embedding", "q.embedding")} > 0
              AND ${dot("c.embedding", "c.embedding")} > 0
          )
          SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
                 FLOOR(cos * 10000.0 + 0.5) / 10000.0 AS score
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rank FROM s)
          WHERE rank <= 5 ORDER BY query_id, rank""",

    // multi-probe oracle: identical plane/signature CTE; the candidate
    // rule widens from signature equality to per-table Hamming <= 1
    // (bit_count of the xor) — exactly the query-side 1-bit-flip probe set
    "ann_lsh_mp_topk" ->
      s"""WITH planes(pg, w) AS (VALUES ${lshPlanesValues(8, 8, 64)}),
          sigs AS (
            SELECT e.vec_id AS id, pg // 8 AS t,
                   CAST(SUM(CASE WHEN list_reduce(list_prepend(0.0,
                       list_transform(generate_series(1, 64),
                         i -> e.embedding[i]::DOUBLE * w[i])),
                       (x, y) -> x + y) > 0
                     THEN (1::BIGINT << (pg % 8)) ELSE 0 END) AS BIGINT) AS sig
            FROM embeddings e CROSS JOIN planes
            GROUP BY 1, 2
          ),
          cand AS (
            SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id
            FROM sigs q JOIN sigs c
              ON q.t = c.t AND bit_count(xor(q.sig, c.sig)) <= 1 AND q.id <> c.id
            WHERE q.id < 20
          ),
          s AS (
            SELECT cand.query_id, cand.neighbor_id,
              ${dot("q.embedding", "c.embedding")} /
                (SQRT(${dot("q.embedding", "q.embedding")}) *
                 SQRT(${dot("c.embedding", "c.embedding")})) AS cos
            FROM cand
            JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.neighbor_id
            WHERE ${dot("q.embedding", "q.embedding")} > 0
              AND ${dot("c.embedding", "c.embedding")} > 0
          )
          SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
                 FLOOR(cos * 10000.0 + 0.5) / 10000.0 AS score
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rank FROM s)
          WHERE rank <= 5 ORDER BY query_id, rank""",

    "ann_cosine_topk" ->
      s"""WITH s AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              ${dot("q.embedding", "c.embedding")} /
                (SQRT(${dot("q.embedding", "q.embedding")}) *
                 SQRT(${dot("c.embedding", "c.embedding")})) AS cos
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < 20
              AND ${dot("q.embedding", "q.embedding")} > 0
              AND ${dot("c.embedding", "c.embedding")} > 0
          )
          SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
                 FLOOR(cos * 10000.0 + 0.5) / 10000.0 AS score
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rank FROM s)
          WHERE rank <= 5 ORDER BY query_id, rank""",

    // the cosine oracle with the hard-negative band applied BEFORE the
    // per-query rank — both band edges re-derived by DuckDB
    "ann_hard_negatives" ->
      s"""WITH s AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              ${dot("q.embedding", "c.embedding")} /
                (SQRT(${dot("q.embedding", "q.embedding")}) *
                 SQRT(${dot("c.embedding", "c.embedding")})) AS cos
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < 20
              AND ${dot("q.embedding", "q.embedding")} > 0
              AND ${dot("c.embedding", "c.embedding")} > 0
          )
          SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
                 FLOOR(cos * 10000.0 + 0.5) / 10000.0 AS score
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rank
                FROM s WHERE cos >= 0.2 AND cos < 0.8)
          WHERE rank <= 5 ORDER BY query_id, rank""",

    // boilerplate: chunking, the per-source distinct-doc frequency rule,
    // the threshold, and the token-stream rewrite all re-derived by
    // DuckDB — grouping by chunk TEXT where Spark groups by xxhash64
    // (the dedup-family collision trade, decided the same way)
    "cur_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, source, $tokensSql AS w FROM documents),
          chunks AS (SELECT doc_id, source, i AS idx,
                array_to_string(w[(i*8+1):(i*8+8)], ' ') AS chunk
              FROM toks,
                   unnest(generate_series(0, CAST(len(w)//8 AS BIGINT) - 1)) t(i)),
          srcn AS (SELECT source, COUNT(*) AS ndocs FROM documents GROUP BY 1),
          hot AS (SELECT f.source, f.chunk
                  FROM (SELECT source, chunk, COUNT(DISTINCT doc_id) AS nd
                        FROM chunks GROUP BY 1, 2) f
                  JOIN srcn s USING (source)
                  WHERE f.nd >= GREATEST(2, CAST(CEIL(0.0 * s.ndocs) AS BIGINT))),
          drops AS (SELECT c.doc_id, list(c.idx) AS di
                    FROM chunks c JOIN hot h
                      ON h.source = c.source AND h.chunk = c.chunk
                    GROUP BY c.doc_id)
          SELECT t.doc_id, t.source,
                 CAST(len(t.w)//8 AS INTEGER) AS n_chunks,
                 CAST(coalesce(len(d.di), 0) AS INTEGER) AS n_dropped,
                 COALESCE(array_to_string(list_transform(
                   list_filter(generate_series(1, len(t.w)),
                     i -> (i-1) >= (len(t.w)//8)*8
                       OR NOT list_contains(coalesce(d.di, []::BIGINT[]),
                                            (i-1)//8)),
                   i -> t.w[i]), ' '), '') AS clean_text
          FROM toks t LEFT JOIN drops d USING (doc_id)
          ORDER BY t.doc_id""",

    // replica of the REAL decode path's arithmetic: the PPM raster is the
    // 192-byte ASCII prefix, so codes == raster bytes; lum = 299R+587G+114B
    // per pixel; at 8×8 each aHash block is one pixel, bit b set iff
    // lum[b]*64 > total (integer cross-multiply, exactly imageAHash);
    // bit 63 contributes Long.MinValue in the signed result
    "mm_image_decode" ->
      """WITH q AS (
           SELECT doc_id, substring(text,1,192) AS s FROM documents
           WHERE length(text) >= 192
             AND octet_length(encode(substring(text,1,192))) = 192
         ), cz AS (
           SELECT doc_id,
                  list_transform(string_split(s,''), c -> ascii(c)::BIGINT) AS codes
           FROM q
         ), lz AS (
           SELECT doc_id, codes,
             list_transform(generate_series(0,63), i ->
               299*codes[3*i+1] + 587*codes[3*i+2] + 114*codes[3*i+3]) AS lum
           FROM cz
         ), f AS (
           SELECT doc_id, lum,
             list_sum(lum) AS total,
             list_sum(list_transform(generate_series(0,63), i -> codes[3*i+1])) AS sr,
             list_sum(list_transform(generate_series(0,63), i -> codes[3*i+2])) AS sg,
             list_sum(list_transform(generate_series(0,63), i -> codes[3*i+3])) AS sb
           FROM lz
         )
         SELECT doc_id,
           CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           CAST(sr // 64 AS INTEGER) AS mean_r,
           CAST(sg // 64 AS INTEGER) AS mean_g,
           CAST(sb // 64 AS INTEGER) AS mean_b,
           CAST(list_sum(list_transform(generate_series(0,63), b ->
             CASE WHEN lum[b+1]*64 > total
                  THEN CASE WHEN b = 63 THEN -9223372036854775807::BIGINT - 1
                            ELSE (1::BIGINT << b) END
                  ELSE 0::BIGINT END)) AS BIGINT) AS phash
         FROM f ORDER BY doc_id""",

    // brute-force hamming pair join over the REAL-decode audio energy
    // fingerprint (4 samples per window at n=256) — banding completeness;
    // samples are the ASCII codes doubled mod 256 (the pcmDoubled payload)
    "mm_audio_neardup" ->
      """WITH q AS (
           SELECT doc_id, substring(text,1,256) AS s FROM documents
           WHERE length(text) >= 256
             AND octet_length(encode(substring(text,1,256))) = 256
         ), cz AS (
           SELECT doc_id,
                  list_transform(string_split(s,''),
                                 c -> (ascii(c)::BIGINT * 2) % 256) AS codes
           FROM q
         ), f AS (
           SELECT doc_id, list_transform(generate_series(0,63), i ->
               (codes[4*i+1]-128)*(codes[4*i+1]-128)
             + (codes[4*i+2]-128)*(codes[4*i+2]-128)
             + (codes[4*i+3]-128)*(codes[4*i+3]-128)
             + (codes[4*i+4]-128)*(codes[4*i+4]-128)) AS en
           FROM cz
         ), g AS (
           SELECT doc_id, en, list_sum(en) AS total FROM f
         ), sh AS (
           SELECT doc_id, CAST(list_sum(list_transform(generate_series(0,63), b ->
             CASE WHEN en[b+1]*64 > total
                  THEN CASE WHEN b = 63 THEN -9223372036854775807::BIGINT - 1
                       ELSE (1::BIGINT << b) END
                  ELSE 0::BIGINT END)) AS BIGINT) AS fp
           FROM g
         )
         SELECT a.doc_id AS d1, b.doc_id AS d2,
                CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hd
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.fp, b.fp)) <= 12
         ORDER BY d1, d2""",

    // brute-force hamming pair join over the REAL-decode aHash — the
    // banding provably finds exactly these pairs (bands > maxHamming)
    "mm_image_neardup" ->
      """WITH q AS (
           SELECT doc_id, substring(text,1,192) AS s FROM documents
           WHERE length(text) >= 192
             AND octet_length(encode(substring(text,1,192))) = 192
         ), cz AS (
           SELECT doc_id,
                  list_transform(string_split(s,''), c -> ascii(c)::BIGINT) AS codes
           FROM q
         ), f AS (
           SELECT doc_id, list_transform(generate_series(0,63), i ->
             299*codes[3*i+1] + 587*codes[3*i+2] + 114*codes[3*i+3]) AS lum
           FROM cz
         ), g AS (
           SELECT doc_id, lum, list_sum(lum) AS total FROM f
         ), sh AS (
           SELECT doc_id, CAST(list_sum(list_transform(generate_series(0,63), b ->
             CASE WHEN lum[b+1]*64 > total
                  THEN CASE WHEN b = 63 THEN -9223372036854775807::BIGINT - 1
                       ELSE (1::BIGINT << b) END
                  ELSE 0::BIGINT END)) AS BIGINT) AS ph
           FROM g
         )
         SELECT a.doc_id AS d1, b.doc_id AS d2,
                CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hd
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.ph, b.ph)) <= 13
         ORDER BY d1, d2""",

    // replica of the REAL multi-frame decode: frame 0 = the 8×8 aHash over
    // chars 1..192 (same arithmetic as mm_image_decode), frame 1 = the 4×4
    // frame over chars 193..240 whose 8×8 block grid is sparse — only
    // blocks at odd (row, col) hold a pixel, so bit (2y+1)*8+(2x+1) maps
    // pixel (x,y), bit 63 again carrying Long.MinValue in the signed result
    "mm_video_frames" ->
      """WITH q AS (
           SELECT doc_id, substring(text,1,240) AS s FROM documents
           WHERE length(text) >= 240
             AND octet_length(encode(substring(text,1,240))) = 240
         ), cz AS (
           SELECT doc_id,
                  list_transform(string_split(s,''), c -> ascii(c)::BIGINT) AS codes
           FROM q
         ), f AS (
           SELECT doc_id,
             list_transform(generate_series(0,63), i ->
               299*codes[3*i+1] + 587*codes[3*i+2] + 114*codes[3*i+3]) AS lum0,
             list_transform(generate_series(0,15), i ->
               299*codes[192+3*i+1] + 587*codes[192+3*i+2] + 114*codes[192+3*i+3]) AS lum4
           FROM cz
         ), g AS (
           SELECT doc_id, lum0, lum4,
                  list_sum(lum0) AS total0, list_sum(lum4) AS total4 FROM f
         )
         SELECT doc_id, CAST(0 AS INTEGER) AS frame_idx,
           CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           CAST(list_sum(list_transform(generate_series(0,63), b ->
             CASE WHEN lum0[b+1]*64 > total0
                  THEN CASE WHEN b = 63 THEN -9223372036854775807::BIGINT - 1
                       ELSE (1::BIGINT << b) END
                  ELSE 0::BIGINT END)) AS BIGINT) AS frame_phash
         FROM g
         UNION ALL
         SELECT doc_id, CAST(1 AS INTEGER), CAST(4 AS INTEGER), CAST(4 AS INTEGER),
           CAST(list_sum(list_transform(generate_series(0,15), j ->
             CASE WHEN lum4[j+1]*16 > total4
                  THEN CASE WHEN j = 15 THEN -9223372036854775807::BIGINT - 1
                       ELSE (1::BIGINT << ((2*(j//4)+1)*8 + 2*(j%4)+1)) END
                  ELSE 0::BIGINT END)) AS BIGINT)
         FROM g
         ORDER BY doc_id, frame_idx""",

    // replica of the SAMPLED walk at stride 2 over the three-frame stream:
    // only frames 0 (dense 8×8 over chars 1..192) and 2 (sparse 4×4 over
    // chars 385..432) appear; frame 1 exists solely as the 203 bytes the
    // skip path must step over correctly to land frame 2's offset
    "mm_video_sample" ->
      """WITH q AS (
           SELECT doc_id, substring(text,1,432) AS s FROM documents
           WHERE length(text) >= 432
             AND octet_length(encode(substring(text,1,432))) = 432
         ), cz AS (
           SELECT doc_id,
                  list_transform(string_split(s,''), c -> ascii(c)::BIGINT) AS codes
           FROM q
         ), f AS (
           SELECT doc_id,
             list_transform(generate_series(0,63), i ->
               299*codes[3*i+1] + 587*codes[3*i+2] + 114*codes[3*i+3]) AS lum0,
             list_transform(generate_series(0,15), i ->
               299*codes[384+3*i+1] + 587*codes[384+3*i+2] + 114*codes[384+3*i+3]) AS lum4
           FROM cz
         ), g AS (
           SELECT doc_id, lum0, lum4,
                  list_sum(lum0) AS total0, list_sum(lum4) AS total4 FROM f
         )
         SELECT doc_id, CAST(0 AS INTEGER) AS frame_idx,
           CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           CAST(list_sum(list_transform(generate_series(0,63), b ->
             CASE WHEN lum0[b+1]*64 > total0
                  THEN CASE WHEN b = 63 THEN -9223372036854775807::BIGINT - 1
                       ELSE (1::BIGINT << b) END
                  ELSE 0::BIGINT END)) AS BIGINT) AS frame_phash
         FROM g
         UNION ALL
         SELECT doc_id, CAST(2 AS INTEGER), CAST(4 AS INTEGER), CAST(4 AS INTEGER),
           CAST(list_sum(list_transform(generate_series(0,15), j ->
             CASE WHEN lum4[j+1]*16 > total4
                  THEN CASE WHEN j = 15 THEN -9223372036854775807::BIGINT - 1
                       ELSE (1::BIGINT << ((2*(j//4)+1)*8 + 2*(j%4)+1)) END
                  ELSE 0::BIGINT END)) AS BIGINT)
         FROM g
         ORDER BY doc_id, frame_idx""",

    // brute-force hamming pair join over the majority-vote CLIP signature
    // of the three-frame video payload: frames 0/1 are dense 8×8 aHashes
    // (lum*64 vs frame total), frame 2 the sparse 4×4 hash voting +1 only
    // at odd (row,col) bits — bit b of the clip signature is set iff the
    // three frame votes sum positive, bit 63 carrying Long.MinValue
    "mm_video_neardup" ->
      """WITH q AS (
           SELECT doc_id, substring(text,1,432) AS s FROM documents
           WHERE length(text) >= 432
             AND octet_length(encode(substring(text,1,432))) = 432
         ), cz AS (
           SELECT doc_id,
                  list_transform(string_split(s,''), c -> ascii(c)::BIGINT) AS codes
           FROM q
         ), lz AS (
           SELECT doc_id,
             list_transform(generate_series(0,63), i ->
               299*codes[3*i+1] + 587*codes[3*i+2] + 114*codes[3*i+3]) AS lum0,
             list_transform(generate_series(0,63), i ->
               299*codes[192+3*i+1] + 587*codes[192+3*i+2] + 114*codes[192+3*i+3]) AS lum1,
             list_transform(generate_series(0,15), i ->
               299*codes[384+3*i+1] + 587*codes[384+3*i+2] + 114*codes[384+3*i+3]) AS lum4
           FROM cz
         ), tz AS (
           SELECT doc_id, lum0, lum1, lum4, list_sum(lum0) AS t0,
                  list_sum(lum1) AS t1, list_sum(lum4) AS t4 FROM lz
         ), sh AS (
           SELECT doc_id, CAST(list_sum(list_transform(generate_series(0,63), b ->
             CASE WHEN
               (CASE WHEN lum0[b+1]*64 > t0 THEN 1 ELSE -1 END)
               + (CASE WHEN lum1[b+1]*64 > t1 THEN 1 ELSE -1 END)
               + (CASE WHEN b % 2 = 1 AND (b // 8) % 2 = 1
                       THEN CASE WHEN lum4[((b // 8 - 1) // 2) * 4
                                         + (b % 8 - 1) // 2 + 1] * 16 > t4
                                 THEN 1 ELSE -1 END
                       ELSE -1 END) > 0
             THEN CASE WHEN b = 63 THEN -9223372036854775807::BIGINT - 1
                  ELSE (1::BIGINT << b) END
             ELSE 0::BIGINT END)) AS BIGINT) AS sig
           FROM tz
         )
         SELECT a.doc_id AS d1, b.doc_id AS d2,
                CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hd
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.sig, b.sig)) <= 12
         ORDER BY d1, d2""",

    // replica of resize-then-hash: resized pixel i (4×4, row i//4, col
    // i%4) is the floor mean of its 2×2 source box per channel; the 4×4
    // aHash populates only odd-(row,col) block bits, pixel 15 = bit 63
    // carrying Long.MinValue
    "mm_image_resize" ->
      """WITH q AS (
           SELECT doc_id, substring(text,1,192) AS s FROM documents
           WHERE length(text) >= 192
             AND octet_length(encode(substring(text,1,192))) = 192
         ), cz AS (
           SELECT doc_id,
                  list_transform(string_split(s,''), c -> ascii(c)::BIGINT) AS codes
           FROM q
         ), rz AS (
           SELECT doc_id,
             list_transform(generate_series(0,15), i ->
               list_transform(generate_series(0,2), k ->
                 (codes[3*((i//4*2)*8 + (i%4)*2) + k + 1]
                + codes[3*((i//4*2)*8 + (i%4)*2 + 1) + k + 1]
                + codes[3*((i//4*2+1)*8 + (i%4)*2) + k + 1]
                + codes[3*((i//4*2+1)*8 + (i%4)*2 + 1) + k + 1]) // 4)) AS px
           FROM cz
         ), lz AS (
           SELECT doc_id, px,
             list_transform(generate_series(0,15), i ->
               299*px[i+1][1] + 587*px[i+1][2] + 114*px[i+1][3]) AS lum
           FROM rz
         ), f AS (
           SELECT doc_id, lum,
             list_sum(lum) AS total,
             list_sum(list_transform(generate_series(0,15), i -> px[i+1][1])) AS sr,
             list_sum(list_transform(generate_series(0,15), i -> px[i+1][2])) AS sg,
             list_sum(list_transform(generate_series(0,15), i -> px[i+1][3])) AS sb
           FROM lz
         )
         SELECT doc_id,
           CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
           CAST(sr // 16 AS INTEGER) AS mean_r,
           CAST(sg // 16 AS INTEGER) AS mean_g,
           CAST(sb // 16 AS INTEGER) AS mean_b,
           CAST(list_sum(list_transform(generate_series(0,15), i ->
             CASE WHEN lum[i+1]*16 > total
                  THEN CASE WHEN i = 15 THEN -9223372036854775807::BIGINT - 1
                            ELSE (1::BIGINT << ((2*(i//4)+1)*8 + 2*(i%4)+1)) END
                  ELSE 0::BIGINT END)) AS BIGINT) AS phash
         FROM f ORDER BY doc_id""",

    // replica of the lenient audio decode: clean docs reproduce the
    // doubled-PCM feature arithmetic; corrupt docs (doc_id % 3 = 0, last
    // byte dropped so the data chunk overruns) carry the RIFF walk's
    // literal rejection message with null features
    "mm_audio_errors" ->
      """WITH q AS (
           SELECT doc_id, substring(text,1,256) AS s FROM documents
           WHERE length(text) >= 256
             AND octet_length(encode(substring(text,1,256))) = 256
         ), cz AS (
           SELECT doc_id,
                  list_transform(string_split(s,''),
                                 c -> (ascii(c)::BIGINT * 2) % 256) AS codes
           FROM q WHERE doc_id % 3 != 0
         )
         SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(256 AS INTEGER) AS n_samples,
           CAST(list_sum(codes) // 256 AS INTEGER) AS mean_amp,
           CAST(list_max(codes) AS INTEGER) AS peak,
           CAST(list_sum(list_transform(codes, c -> (c-128)*(c-128))) // 256
                AS BIGINT) AS rms_sq,
           CAST(list_sum(list_transform(generate_series(1,255), i ->
             CASE WHEN (codes[i] < 128) != (codes[i+1] < 128)
                  THEN 1 ELSE 0 END)) AS INTEGER) AS crossings,
           CAST(NULL AS VARCHAR) AS decode_error
         FROM cz
         UNION ALL
         SELECT doc_id, CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
           CAST(NULL AS INTEGER),
           'malformed WAV: chunk ''data'' overruns the file'
         FROM q WHERE doc_id % 3 = 0
         ORDER BY doc_id""",

    // replica of the lenient video walk: every doc yields frames 0 and 1
    // (dense 8×8 hashes); frame 2's sparse 4×4 row appears only for clean
    // docs, and corrupt docs (doc_id % 5 = 0, last raster byte dropped)
    // instead carry one null-frame error row with frame 2's byte offset
    "mm_video_errors" ->
      """WITH q AS (
           SELECT doc_id, substring(text,1,432) AS s FROM documents
           WHERE length(text) >= 432
             AND octet_length(encode(substring(text,1,432))) = 432
         ), cz AS (
           SELECT doc_id,
                  list_transform(string_split(s,''), c -> ascii(c)::BIGINT) AS codes
           FROM q
         ), f AS (
           SELECT doc_id,
             list_transform(generate_series(0,63), i ->
               299*codes[3*i+1] + 587*codes[3*i+2] + 114*codes[3*i+3]) AS lum0,
             list_transform(generate_series(0,63), i ->
               299*codes[192+3*i+1] + 587*codes[192+3*i+2] + 114*codes[192+3*i+3]) AS lum1,
             list_transform(generate_series(0,15), i ->
               299*codes[384+3*i+1] + 587*codes[384+3*i+2] + 114*codes[384+3*i+3]) AS lum4
           FROM cz
         ), g AS (
           SELECT doc_id, lum0, lum1, lum4, list_sum(lum0) AS t0,
                  list_sum(lum1) AS t1, list_sum(lum4) AS t4 FROM f
         )
         SELECT doc_id, CAST(0 AS INTEGER) AS frame_idx,
           CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           CAST(list_sum(list_transform(generate_series(0,63), b ->
             CASE WHEN lum0[b+1]*64 > t0
                  THEN CASE WHEN b = 63 THEN -9223372036854775807::BIGINT - 1
                       ELSE (1::BIGINT << b) END
                  ELSE 0::BIGINT END)) AS BIGINT) AS frame_phash,
           CAST(NULL AS VARCHAR) AS decode_error
         FROM g
         UNION ALL
         SELECT doc_id, CAST(1 AS INTEGER), CAST(8 AS INTEGER), CAST(8 AS INTEGER),
           CAST(list_sum(list_transform(generate_series(0,63), b ->
             CASE WHEN lum1[b+1]*64 > t1
                  THEN CASE WHEN b = 63 THEN -9223372036854775807::BIGINT - 1
                       ELSE (1::BIGINT << b) END
                  ELSE 0::BIGINT END)) AS BIGINT),
           CAST(NULL AS VARCHAR)
         FROM g
         UNION ALL
         SELECT doc_id, CAST(2 AS INTEGER), CAST(4 AS INTEGER), CAST(4 AS INTEGER),
           CAST(list_sum(list_transform(generate_series(0,15), j ->
             CASE WHEN lum4[j+1]*16 > t4
                  THEN CASE WHEN j = 15 THEN -9223372036854775807::BIGINT - 1
                       ELSE (1::BIGINT << ((2*(j//4)+1)*8 + 2*(j%4)+1)) END
                  ELSE 0::BIGINT END)) AS BIGINT),
           CAST(NULL AS VARCHAR)
         FROM g WHERE doc_id % 5 != 0
         UNION ALL
         SELECT doc_id, CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
           'malformed PPM at byte 406: raster truncated: need 48 bytes'
         FROM q WHERE doc_id % 5 = 0
         ORDER BY doc_id, frame_idx""",

    // replica of the lenient tier's contract: clean docs reproduce the
    // mm_image_decode arithmetic; the two corruption classes (truncated
    // raster / corrupted magic, keyed on doc_id % 7) yield null features
    // plus the decoder's exact error string
    "mm_decode_errors" ->
      """WITH q AS (
           SELECT doc_id, substring(text,1,192) AS s FROM documents
           WHERE length(text) >= 192
             AND octet_length(encode(substring(text,1,192))) = 192
         ), cz AS (
           SELECT doc_id,
                  list_transform(string_split(s,''), c -> ascii(c)::BIGINT) AS codes
           FROM q WHERE doc_id % 7 NOT IN (0, 3)
         ), lz AS (
           SELECT doc_id, codes,
             list_transform(generate_series(0,63), i ->
               299*codes[3*i+1] + 587*codes[3*i+2] + 114*codes[3*i+3]) AS lum
           FROM cz
         ), f AS (
           SELECT doc_id, lum,
             list_sum(lum) AS total,
             list_sum(list_transform(generate_series(0,63), i -> codes[3*i+1])) AS sr,
             list_sum(list_transform(generate_series(0,63), i -> codes[3*i+2])) AS sg,
             list_sum(list_transform(generate_series(0,63), i -> codes[3*i+3])) AS sb
           FROM lz
         )
         SELECT doc_id,
           CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           CAST(sr // 64 AS INTEGER) AS mean_r,
           CAST(sg // 64 AS INTEGER) AS mean_g,
           CAST(sb // 64 AS INTEGER) AS mean_b,
           CAST(list_sum(list_transform(generate_series(0,63), b ->
             CASE WHEN lum[b+1]*64 > total
                  THEN CASE WHEN b = 63 THEN -9223372036854775807::BIGINT - 1
                            ELSE (1::BIGINT << b) END
                  ELSE 0::BIGINT END)) AS BIGINT) AS phash,
           CAST(NULL AS VARCHAR) AS decode_error
         FROM f
         UNION ALL
         SELECT doc_id, CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS BIGINT),
           CASE WHEN doc_id % 7 = 0
                THEN 'malformed PPM at byte 0: raster truncated: need 192 bytes'
                ELSE 'malformed PPM at byte 0: magic ''X6'' is not P6' END
         FROM q WHERE doc_id % 7 IN (0, 3)
         ORDER BY doc_id""",

    // replica of the REAL audio decode's integer features over the same
    // 256-byte prefix the query feeds the WAV parser as PCM samples —
    // doubled mod 256 (pcmDoubled), so peak/crossings are data-dependent
    "mm_audio_decode" ->
      """WITH q AS (
           SELECT doc_id, substring(text,1,256) AS s FROM documents
           WHERE length(text) >= 256
             AND octet_length(encode(substring(text,1,256))) = 256
         ), cz AS (
           SELECT doc_id,
                  list_transform(string_split(s,''),
                                 c -> (ascii(c)::BIGINT * 2) % 256) AS codes
           FROM q
         )
         SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(256 AS INTEGER) AS n_samples,
           CAST(list_sum(codes) // 256 AS INTEGER) AS mean_amp,
           CAST(list_max(codes) AS INTEGER) AS peak,
           CAST(list_sum(list_transform(codes, c -> (c-128)*(c-128))) // 256
                AS BIGINT) AS rms_sq,
           CAST(list_sum(list_transform(generate_series(1,255), i ->
             CASE WHEN (codes[i] < 128) != (codes[i+1] < 128)
                  THEN 1 ELSE 0 END)) AS INTEGER) AS crossings
         FROM cz ORDER BY doc_id"""
  )
}
