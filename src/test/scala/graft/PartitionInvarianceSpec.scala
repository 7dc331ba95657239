package graft

import org.apache.spark.sql.functions.col

/** Results must be invariant to the physical partition count — a catch-all
  * against partition-order-dependent logic (boundary carries, per-partition
  * sorts, posting-list grouping, the custom interval-stab shuffles). Runs a
  * representative query per family at shuffle.partitions ∈ {1, 7} and
  * compares row-for-row against the default-4 result.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val representative = Seq(
    "j1_range_join",      // custom interval-stab physical join
    "j6_ordered_reorder", // two-phase global ordering
    "w3_gap_emission",    // distributed lag boundary carry
    "dd_ngram_jaccard",   // posting-list pair generation
    "dd_ppjoin",          // df-ordered prefix join (r10; sampling-based hot
                          // detection must not leak layout into output)
    "dd_hamming",         // sig-level banding + grid salting (r10 shape)
    "dd_sim_components",  // star+sig-edge components (r10)
    "dd_jac_components",  // digest-collapsed jaccard components (r10)
    "dd_dup_windows",     // window-hash postings + semi join
    "sm_pack",            // distributed prefix sum
    "t1_topk_per_group",  // bounded top-k aggregate
    "dd_maximal_spans",   // island merge over the posting seam
    "dd_compaction",      // parquet union + incremental posting walk
    "ann_hnsw_topk",      // sharded graph build + broadcast-query probe
    "ann_ivfpq_topk",     // two-layer Lloyd + ADC probe
    "sm_shuffle",         // GlobalOrder two-phase numbering
    "cur_token_budget",   // prefix sum over a float-keyed global order
    "cur_diverse",        // IVF assignment + BoundedTopK per cell
    "mm_image_decode",    // real PPM decode UDF over in-query payloads
    "mm_audio_neardup",   // decode UDF -> fingerprint -> pigeonhole banding
    "mm_video_frames",    // multi-frame walk flatMap explode
    "mm_video_neardup",   // frame decode -> clip majority vote -> banding
    "mm_decode_errors",   // lenient decode error rows amid clean rows
    "mm_image_resize",    // decode -> integer box resize -> aHash
    "mm_video_sample",    // stride walk, skipped-frame offset arithmetic
    "mm_video_errors",    // lenient prefix walk, error rows amid frames
    "mm_audio_errors",    // lenient RIFF rejection amid clean decodes
    "tx_bpe_encode",      // word-freq training collect + native encode map
    "tx_quality_classifier", // bounded-sample training + literal-weight scoring
    "ir_bm25_topk",       // stats collect + literal-idf scoring + TakeOrdered
    "dd_cosine_neardup_ivf", // IVF cell groupByKey pair sweep (r14)
    "cur_semantic_ivf",   // kept-subset quantizer training + bucketed drop (r15)
    "sm_curriculum",      // desc-keyed GlobalOrder range partitioning (r15)
    "cur_boilerplate")    // per-source freq threshold + index-set rewrite (r14)

  test("representative queries are invariant to shuffle.partitions in {1, 7}") {
    val key = "spark.sql.shuffle.partitions"
    val default = spark.conf.get(key)
    val baseline = representative.map { q =>
      q -> SparkEntry.queries(q)(spark, sf0001).collect().toSeq
    }.toMap
    try {
      for (parts <- Seq("1", "7")) {
        spark.conf.set(key, parts)
        representative.foreach { q =>
          val got = SparkEntry.queries(q)(spark, sf0001).collect().toSeq
          assert(got == baseline(q), s"$q differs at shuffle.partitions=$parts")
        }
      }
    } finally spark.conf.set(key, default)
  }
}
