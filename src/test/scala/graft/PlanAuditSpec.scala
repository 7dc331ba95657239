package graft

import org.apache.spark.sql.DataFrame

/** Executable plan audits: the 100 TB claims each gate query's scaladoc
  * makes, asserted against the actual optimized/physical plan rather
  * than trusted. A regression that silently turns a broadcast join into
  * a nested-loop join, loses a parquet filter pushdown, or widens a
  * pruned scan fails HERE, not in a cluster bill.
  */
class PlanAuditSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf001)

  test("f1_semi_filter: the p_size predicate reaches the parquet scan") {
    val plan = physical(q("f1_semi_filter"))
    assert(plan.contains("PushedFilters") && plan.contains("p_size"),
      s"expected p_size in PushedFilters:\n$plan")
  }

  test("tx_token_count: documents scan pruned to the referenced columns") {
    val plan = physical(q("tx_token_count"))
    val readSchemas = "ReadSchema: [^\n]+".r.findAllIn(plan).toList
    assert(readSchemas.nonEmpty)
    readSchemas.foreach { rs =>
      assert(!rs.contains("lang") && !rs.contains("n_chars"),
        s"documents scan reads unreferenced columns: $rs")
    }
  }

  test("j4_star_revenue: dims broadcast, no shuffle on nation/region") {
    val plan = physical(q("j4_star_revenue"))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast dims:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("j1_range_join: interval-stab physical join, no nested-loop/cartesian") {
    val plan = physical(q("j1_range_join"))
    assert(plan.contains("IntervalStabJoin"),
      s"expected the custom interval-stab strategy to claim the join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to an all-pairs physical join:\n$plan")
  }

  test("ann_lsh_topk: candidate dedup exchange carries ids only, never vectors") {
    val plan = physical(q("ann_lsh_topk"))
    // the OR-amplification dedup is a HashAggregate on (query_id,
    // neighbor_id); the 64-dim embedding arrays must join in AFTER it —
    // a vector-laden dedup exchange is the 100 TB cost the rewrite removed
    val dedupLines = plan.linesIterator
      .filter(l => l.contains("HashAggregate(keys=[query_id") ||
        l.contains("HashAggregate(keys=[neighbor_id"))
      .toList
    assert(dedupLines.nonEmpty, s"expected an id-keyed dedup aggregate:\n$plan")
    dedupLines.foreach { l =>
      assert(!l.contains("qvec") && !l.contains("nvec") && !l.contains("embedding"),
        s"dedup aggregate still carries vectors: $l")
    }
  }

  test("dd_minhash_lsh: candidate generation is an equi-join, not all-pairs") {
    val plan = physical(q("dd_minhash_lsh"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"LSH banding must bucket-join:\n$plan")
  }

  test("dd_hamming: sig-level banding cells, equi-joins only, every exchange fixed-width") {
    val df = q("dd_hamming")
    val plan = physical(df)
    // the r10 decomposition: banding + hamming verify run over DISTINCT
    // signatures inside MapGroups; doc expansion (hd-0 self-join, sig-pair
    // join-back) is spill-safe EQUI-joins on long keys — never an
    // all-pairs physical join
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"simhash banding degenerated to an all-pairs join:\n$plan")
    val opt = optimized(df)
    assert(opt.contains("MapGroups"), s"expected per-cell MapGroups:\n$opt")
    // the memory-bound claim, executable: no exchange carries anything but
    // fixed-width atoms (doc ids, sigs, cells, grid tags, hd) — document
    // text, signature ARRAYS, and payload bytes never shuffle
    withAqeOff { assertExchangesFixedWidth("dd_hamming", q("dd_hamming")) }
  }

  /** Plan `f` with AQE off so ShuffleExchangeExec nodes are visible to
    * `plan.collect`: under AQE the executedPlan root is an
    * AdaptiveSparkPlanExec whose inner plan is a FIELD, not a child —
    * a bare collect over it returns nothing, silently turning every
    * exchange audit vacuous (the r10 audit fix; the static exchange
    * shape asserted here is what AQE then refines at runtime).
    */
  private def withAqeOff[T](f: => T): T = {
    val k = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(k)
    spark.conf.set(k, "false")
    try f finally spark.conf.set(k, old)
  }

  /** All exchanges in the plan, descending into persisted-seam scans
    * (InMemoryTableScan): the dedup pair-table memo hides its pair-stage
    * exchanges inside the cached plan, and skipping them would exempt
    * exactly the stage the audit is about.
    */
  private def shufflesOf(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] =
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => Seq(e)
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        shufflesOf(s.relation.cachedPlan)
    }.flatten

  private def shufflesOf(df: DataFrame)
      : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] =
    shufflesOf(df.queryExecution.executedPlan)

  /** Every ShuffleExchange in `df`'s physical plan carries only atomic
    * fixed-width columns (long/int/double/bool/date …) apart from
    * `allowNames` — no string, array, map, struct, or binary attribute.
    * This is the executable form of the dedup/ANN scaladoc claims that
    * shuffles move "(long, long) rows", not document content.
    */
  private def assertExchangesFixedWidth(
      name: String, df: DataFrame, allowNames: Set[String] = Set.empty): Unit = {
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StringType, StructType}
    val shuffles = shufflesOf(df)
    assert(shuffles.nonEmpty, s"$name: expected at least one exchange to audit")
    shuffles.foreach { e =>
      val bad = e.output.filter { a =>
        !allowNames(a.name) && (a.dataType match {
          case _: ArrayType | _: MapType | _: StructType | BinaryType | StringType => true
          case _ => false
        })
      }
      assert(bad.isEmpty, s"$name shuffles wide/variable content: " +
        bad.map(b => s"${b.name}:${b.dataType.simpleString}").mkString(", "))
    }
  }

  test("dedup family: exchanges carry ids/sigs/counts only — corpus content never shuffles") {
    // jaccard postings ride (doc, n, shingle-hash) longs; incremental adds
    // a boolean; pair tables and components are (long, long[, double]).
    // A refactor that widens any of these exchanges (e.g. joins shingle
    // arrays back in, or shuffles text) fails here.
    // drop memoized pair tables so their cached plans rebuild under the
    // AQE-off planning below (a cache captured under AQE would hide its
    // exchanges behind the adaptive wrapper)
    graft.text.Dedup.clearPairTables()
    withAqeOff {
      for (name <- Seq("dd_ngram_jaccard", "dd_incremental", "dd_compaction",
          "dd_simhash", "dd_components", "dd_sim_components",
          "dd_jac_components", "dd_canonical", "dd_normalized"))
        assertExchangesFixedWidth(name, q(name))
      // MinHash+LSH: the banded bucket folds to a LONG key before the
      // shuffle (collision = merged buckets = extra candidates that exact
      // verification rejects — free), so only the exact-verify join's
      // shingle sets — the documented contract for the few surviving
      // candidates — are allowed BY NAME; everything else stays fixed-width
      assertExchangesFixedWidth("dd_minhash_lsh", q("dd_minhash_lsh"),
        allowNames = Set("shingles", "sh1", "sh2"))
    }
  }

  test("j6_ordered_reorder: no single-partition Exchange in the plan") {
    val plan = physical(q("j6_ordered_reorder"))
    assert(!plan.contains("SinglePartition"),
      s"global ordering must not funnel through one partition:\n$plan")
  }

  test("EVERY gate query plan is free of single-partition exchanges") {
    // the one allowed shape: a global SCALAR aggregate's final stage, whose
    // single-partition exchange carries one pre-aggregated row per upstream
    // partition (a1's corpus total) — never row data
    // sm_temperature's mixing normalizer (20 partial rows of source-count
    // sqrts) and tx_perplexity's vocab size (partial counts) are the same
    // shape — source/vocab-cardinality scalar finals, never corpus rows
    // ir_term_stats is the same shape: a query-length-bounded df/cf scalar
    // final (one 6-column partial row per upstream partition)
    val scalarAggFinal =
      Set("a1_distribution_count", "sm_temperature", "sm_temperature_epochs",
        "tx_perplexity", "ir_term_stats",
        // total/wsum over the ~20-row source dim (r14) — same shape
        "sm_mixture")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(scalarAggFinal)
      .flatMap { name =>
        val plan = physical(SparkEntry.queries(name)(spark, sf001))
        if (plan.contains("SinglePartition")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"queries funneling through one partition: ${offenders.mkString(", ")}")
  }

  test("cur_diverse: per-cell selection is a map-side-combining aggregate, not a Window") {
    // 16 cells: a row_number().over(partitionBy(cell)) would funnel the
    // corpus through 16 partitions — the BoundedTopK aggregate path must
    // keep the plan Window-free
    val plan = physical(q("cur_diverse"))
    assert(!plan.contains("Window"),
      s"cur_diverse must not select per-cell rows with a Window:\n$plan")
  }

  test("cur_semantic: drop-list anti-join broadcasts, no nested loop") {
    val plan = physical(q("cur_semantic"))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"the duplicate drop-list must broadcast into an anti hash join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("cur_semantic_ivf: anti-join is a hash join with no FORCED broadcast hint") {
    // the scale path must not hint broadcast(drop): on a duplicate-heavy
    // corpus the drop list is O(corpus) (the r13 ADVICE rule) — AQE picks
    // the join strategy from runtime sizes instead
    val df = q("cur_semantic_ivf")
    val plan = physical(df)
    assert(plan.contains("LeftAnti"), s"expected the drop anti-join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"semantic drop degenerated to an all-pairs physical join:\n$plan")
    val hints = df.queryExecution.logical.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h.name
    }
    assert(hints.isEmpty, s"no join hints expected in the logical plan, got $hints")
  }

  test("x1/x2/x3 native kernels stay inside whole-stage codegen (no ScalaUDF)") {
    assert(!physical(q("x1_direct_text")).contains("ScalaUDF"))
    assert(!physical(q("x2_edit_text")).contains("ScalaUDF"))
    assert(!physical(q("x3_consistency_text")).contains("ScalaUDF"))
  }

  test("dd_ppjoin verify runs the native merge kernel, not a boxed UDF") {
    // the r10 profile: a Seq[Long] UDF here boxed both shingle arrays per
    // candidate pair and split the fused verify stage out of codegen
    // (3.99 s → 1.4 s at sf0.1 when replaced)
    val plan = physical(q("dd_ppjoin"))
    assert(plan.contains("sorted_long_intersect_count"),
      s"expected the native intersect kernel in the verify plan:\n$plan")
  }

  test("r11: full-corpus map paths are native — no ScalaUDF in any dedup/ANN signature plan") {
    // the r10 verdict's headroom item: shingle hashing, MinHash/hyperplane
    // signatures, and the CMS-ordered prefix sort were the last boxed UDFs
    // on full-corpus map stages; all are native codegen expressions now, so
    // these plans must be ScalaUDF-free END TO END (a regression that
    // reintroduces a converter-boxed stage on the corpus-wide path fails
    // here, not in a cluster bill)
    for (name <- Seq("dd_minhash_lsh", "ann_lsh_topk", "dd_ppjoin",
        "dd_ngram_jaccard", "dd_jac_components",
        "dd_simhash", "dd_hamming", "dd_sim_components",
        "tx_top_ngrams", "dd_dup_windows", "dd_maximal_spans",
        "tx_repetition", "cur_dedup_spans",
        "cur_pii_stats", "cur_pii_redact", "cur_decontaminate_bloom",
        "ann_lsh_mp_topk", "sm_temperature", "tx_perplexity",
        "tx_bpe_encode", "tx_quality_classifier",
        // r15: the ADC shortlist scoring moved from a boxed Seq[Double]
        // UDF to the native pq_adc_native kernel
        "ann_ivfpq_topk")) {
      val plan = physical(q(name))
      assert(!plan.contains("ScalaUDF"),
        s"$name: expected a fully native map path, found a ScalaUDF:\n$plan")
    }
  }

  test("tx_bpe_encode: pure map until the output sort — one exchange, pruned scan") {
    // the encode stage is a full-corpus map (native kernel + memo); the
    // ONLY shuffle in the gate plan is the presentation orderBy. A second
    // exchange here would mean the encode path started shuffling documents
    withAqeOff {
      val df = q("tx_bpe_encode")
      assert(shufflesOf(df).size == 1,
        s"expected exactly the orderBy exchange:\n${physical(df)}")
      val readSchemas = "ReadSchema: [^\n]+".r.findAllIn(physical(df)).toList
      assert(readSchemas.nonEmpty)
      readSchemas.foreach { rs =>
        assert(!rs.contains("lang") && !rs.contains("source"),
          s"documents scan reads unreferenced columns: $rs")
      }
    }
  }

  test("ir_bm25_topk: index-free retrieval — zero exchanges, TakeOrdered top-k") {
    // the scaladoc claim, executable: scoring is a scan-stage map and the
    // top-k is TakeOrderedAndProject — the corpus is never shuffled and
    // never globally sorted
    withAqeOff {
      val df = q("ir_bm25_topk")
      assert(shufflesOf(df).isEmpty,
        s"expected a shuffle-free retrieval plan:\n${physical(df)}")
      assert(physical(df).contains("TakeOrderedAndProject"),
        s"expected TakeOrdered top-k:\n${physical(df)}")
    }
  }

  test("ir_batch_bm25: join-free dims, no Window, term strings never shuffle") {
    withAqeOff {
      val df = q("ir_batch_bm25")
      val plan = physical(df)
      // the query-sized term/query dims fold into codegen CASE literals —
      // no join of any kind in the plan (a broadcast dim here costs a
      // whole broadcast-build job per run)
      assert(!plan.contains("Join"), s"expected a join-free plan:\n$plan")
      assert(!plan.contains("Window"),
        s"per-query top-k must be the bounded aggregate, not a Window:\n$plan")
      // corpus content (the term string) folds to an int id before any
      // exchange; the only array attribute allowed across a shuffle is the
      // bounded top-k aggregation buffer (≤k slim pairs per query)
      val offending = shufflesOf(df).flatMap(_.output).filter { a =>
        a.dataType.isInstanceOf[org.apache.spark.sql.types.StringType.type]
      }
      assert(offending.isEmpty,
        s"string attributes cross a shuffle: ${offending.map(_.name)}\n$plan")
    }
  }

  test("sm_temperature / tx_perplexity: corpus joins only against broadcast dims") {
    // both ops join the full corpus against tiny derived dims (source
    // rates; vocab-sized LM count tables) — those joins must broadcast,
    // never sort-merge the corpus
    for (name <- Seq("sm_temperature", "tx_perplexity")) {
      val plan = physical(q(name))
      assert(plan.contains("BroadcastHashJoin"), s"$name: expected broadcast dims:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$name: corpus must not sort-merge:\n$plan")
    }
  }

  test("bloom decontamination: the native probe filters at scan stage") {
    val plan = physical(q("cur_decontaminate_bloom"))
    assert(plan.contains("bloom_might_contain_long_native"),
      s"expected the native bloom probe in the plan:\n$plan")
    // join-side SIZE isn't a plan-string property — the no-broadcast-
    // dependence claim is checked behaviorally in BloomExpressionsSpec
    // ("runs broadcast-free"), not here
  }

  test("ann brute/ivf/lsh scoring runs the native dot kernel; brute plan is UDF-free") {
    // same pathology class: the Seq[Double] dot UDF boxed both vectors per
    // scored pair (ann_cosine_topk 0.82 s → ~0.5 s replaced)
    val brute = physical(q("ann_cosine_topk"))
    assert(brute.contains("double_array_dot_native"),
      s"expected the native dot kernel in the brute plan:\n$brute")
    assert(!brute.contains("ScalaUDF"),
      s"brute cosine must stay entirely inside codegen:\n$brute")
    assert(physical(q("ann_ivf_topk")).contains("double_array_dot_native"))
    assert(physical(q("ann_lsh_topk")).contains("double_array_dot_native"))
  }

  test("mm video family: binary payloads never cross a shuffle; banding joins nothing") {
    // the 100 TB claim of the decode tier: decode/vote/sample are map-side,
    // so every Exchange in every video query carries only ids + fixed-width
    // feature rows — never the payload bytes (withAqeOff because a bare
    // collect over an AQE executedPlan is VACUOUS — the r10 audit fix;
    // nonEmpty guards against ever regressing to that)
    withAqeOff {
      for (name <- Seq("mm_video_frames", "mm_video_sample", "mm_video_errors",
          "mm_video_neardup")) {
        val shuffles = shufflesOf(q(name))
        assert(shuffles.nonEmpty, s"$name: expected at least one exchange to audit")
        shuffles.foreach { e =>
          val bad = e.output.filter(a =>
            a.name == "payload" || a.name == "p" || a.dataType.typeName == "binary")
          assert(bad.isEmpty,
            s"$name shuffles payload bytes: ${bad.map(_.name).mkString(",")}")
        }
      }
    }
    // the clip near-dup rides the shared sig-level banding (dd_hamming's
    // audited r10 shape): per-cell MapGroups over distinct sigs, doc
    // expansion via equi-joins on long keys, no all-pairs physical join —
    // and the fixed-width exchange audit above already proved no payload
    // crosses a shuffle
    val nd = q("mm_video_neardup")
    val opt = optimized(nd)
    assert(opt.contains("MapGroups"), s"expected per-cell MapGroups:\n$opt")
    val ndPlan = physical(nd)
    assert(!ndPlan.contains("BroadcastNestedLoopJoin") && !ndPlan.contains("CartesianProduct"),
      s"clip banding degenerated to an all-pairs join:\n$ndPlan")
  }

  test("ev_sessionize: windows and aggregation partition by user_id") {
    val plan = physical(q("ev_sessionize"))
    assert(plan.contains("hashpartitioning(user_id"),
      s"per-user windows must hash-partition on user_id:\n$plan")
    assert(!plan.contains("SinglePartition"))
  }

  test("t1_topk_per_group: bounded aggregate with map-side combine, no Window") {
    val plan = physical(q("t1_topk_per_group"))
    // a Window partitioned by the 3-value l_returnflag would funnel the
    // table through 3 partitions; the typed BoundedTopK aggregate must
    // keep it an Aggregate with a partial (map-side) phase instead
    assert(!plan.contains("Window"),
      s"top-k per low-cardinality group must not use a window:\n$plan")
    assert(plan.contains("Aggregate"), s"expected an aggregate plan:\n$plan")
    assert(plan.contains("partial"), s"expected map-side partial aggregation:\n$plan")
  }
}
