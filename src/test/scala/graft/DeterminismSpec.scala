package graft

/** Partitioning-invariance: the determinism conventions (exact DECIMAL
  * money math, integer basis points, quantized-integer dots, md5-keyed
  * sampling, pinned total orders) exist so results do not depend on
  * shuffle layout or merge order. This spec tests that property
  * DIRECTLY: representative queries from every family must produce
  * bit-identical rows in identical order under different
  * shuffle-partition counts — the single-box stand-in for "same answer
  * on a 1000-executor cluster". */
class DeterminismSpec extends SparkTestBase {

  // one per family: decimal aggs, double-sensitive UDAF, joined weights,
  // sketch families, quantized cosine, window running sums, md5
  // sampling, iterative CC, count-ratio scoring, prefix-filtered join
  private val picks = Seq(
    "q_agg_hash", "q_udaf_geomean", "q_tfidf", "q_minhash_dedup",
    "q_simhash", "q_cosine_topk", "q_win_running", "q_sample_weighted",
    "q_dedup_cluster", "q_lm_score", "q_simjoin", "q_topk_agg",
    // round-8 additions: driver-loop fixpoint (argmax ties pinned),
    // store-based dedup, audits, integer-split attribution,
    // percentile-bounds histogram
    "q_bpe_train", "q_incr_dedup", "q_incr_neardup", "q_minhash_est",
    "q_ann_recall", "q_attribution", "q_histogram_eqd", "q_pit_join",
    "q_winnow", "q_dq_assert",
    // round-11 additions: hashed-weight classifier, URL canon dedup,
    // bigram repetition filter, temperature mixture planner
    "q_classifier_score", "q_url_canon", "q_rep_bigram", "q_mix_temperature",
    "q_vocab_coverage",
    // round-13 additions — the restored events family now reads ts
    // through the NTZ-normalizing cast, so its partition-invariance is
    // asserted on the new read path: session windows, as-of join,
    // gap-fill interpolation, event-time dedup windows
    "q_evt_session", "q_join_asof", "q_gapfill", "q_evt_uniques",
    // round-14 session-2 additions: integer-rational rankings and the
    // bloom prefilter (its bitmap is built FROM an aggregation — a
    // partition-dependent build would corrupt the candidate set)
    "q_bm25", "q_pmi_colloc", "q_bloom_decontaminate", "q_dsir",
    // round-15 additions: counter-matrix sketch (vector-add merge),
    // 64-bit majority-vote banding, corpus-wide kNN graph (mutual
    // flag from a pair self-join), sqrt-balanced cell sampling, and
    // the hive-partitioned roundtrip (directory layout must not leak
    // into results)
    "q_agg_cms", "q_simhash_pairs", "q_knn_graph", "q_cluster_sample",
    "q_source_partitioned",
    // drift monitors: ppm contingency staging; KS max-D argmin over
    // the bucketed prefix sum
    "q_chi2_drift", "q_ks_drift",
    // third dedup-cluster leg: Hamming pairs through the CC kernel
    "q_simhash_cluster",
    // round-16 additions: content-defined chunking (row-local boundary
    // arithmetic), Levenshtein blocked-verify, skipgram pair counts
    // (top-30 tie order pinned by the (cnt, w, c, dist) total order)
    "q_cdc_chunks", "q_editsim", "q_skipgram",
    // round-16 closing additions: hardest-pair mining (rank-1 pivot
    // under the (cosine, b_id) total order), label propagation
    // (majority vote tie-broken (votes DESC, label ASC)), md5-rank
    // contribution cap, two-level bigram vocabulary rollup
    "q_contrastive_pairs", "q_label_prop", "q_contrib_cap",
    "q_lexical_stats",
    // round-17 additions: multi-hop propagation (adopted labels feed
    // later hops — hop order must not depend on partitioning),
    // corpus-wide hard-negative mining over the banded adjacency
    "q_label_prop_multi", "q_hard_negatives")

  test("results are bit-identical across shuffle-partition counts") {
    val qs = SparkEntry.queries
    def run(name: String, parts: Int): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try qs(name)(spark, sfDir).collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    picks.foreach { name =>
      val a = run(name, 3)
      val b = run(name, 11)
      assert(a.nonEmpty, s"$name returned no rows at sf0.001")
      assert(a == b, s"$name diverges across partitionings")
    }
  }
}
