package graft

/** Suite-wide physical-plan audit: EVERY SparkEntry query is planned
  * against real data and scanned for join shapes that do not survive
  * scale — an accidental cartesian product or an unbounded
  * nested-loop join is exactly the class of bug that passes a 60k-row
  * correctness gate and then melts a 1000-executor cluster.
  *
  * Cartesian products are banned outright. BroadcastNestedLoopJoin is
  * allowed only for queries that deliberately cross-join a bounded
  * one-row/model-sized frame (grand totals, trained centroids, the
  * synthetic-batch offset); each allowance below names its bounded
  * side. Anything new that plans a BNLJ must either justify itself
  * here or restructure into an equi-join.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // queries whose BroadcastNestedLoopJoin is a bounded broadcast by
  // construction — the broadcast side is O(1) rows or O(model), never
  // O(data):
  private val boundedBnlj: Map[String, String] = Map(
    "q_dedup_incremental" -> "1-row max(doc_id) offset (syntheticBatch)",
    "q_item_edges_incremental" -> "1-row max(l_orderkey) offset for the new-order batch",
    "q_dedup_incremental_rederive" -> "1-row max(doc_id) offset (syntheticBatch)",
    "q_minhash_incremental" -> "1-row max(doc_id) offset (syntheticBatch)",
    "q_substring_incremental" -> "1-row max(doc_id) offset (syntheticBatch)",
    "q_simhash_incremental" -> "1-row max(doc_id) offset (syntheticBatch)",
    "q_drift_chi2" -> "1-row per-period totals for the chi-square",
    "q_cuped" -> "1-row global co-moment frame (theta) into the arm rows",
    "q_dq_report" -> "1-row grand totals (QualityReport)",
    "q_knn_ivf_probe" -> "k trained centroids (model-sized)",
    "q_funnel_steps" -> "funnel step dimension (#steps rows, >= join)",
    "q_funnel_latency" -> "funnel step dimension (#steps rows)",
    "q_ab_funnel" -> "funnel step dimension (#steps rows)",
    "q_session_funnel" -> "funnel step dimension (#steps rows)",
    "q_knn_topk" -> "broadcast query set (brute-force kNN contract)",
    "q_knn_label_purity" -> "broadcast probe set (brute-force 1-NN purity contract)",
    "q_token_lift" -> "broadcast ONE-row doc-count frame into the pair aggregate",
    "q_ann_recall" -> "broadcast query set (brute-force exact side of the recall audit)",
    "q_bm25" -> "query-term doc-frequencies + 1-row corpus stats",
    // (q_rfm's 1-row dataset-max-timestamp BNLJ now runs inside the
    // r12 per-user localCheckpoint, so it no longer appears in the
    // final plan text this audit reads)
    "q_corr_matrix" -> "1-row lazy maxUniverse guard (assert_true over a distinct count)",
    "q22_wealthy_inactive" -> "1-row positive-balance (count, sum) totals",
    "q_five_number" -> "1-row grand count for the exact rank cuts",
    "q_bloom_dedup" -> "1-row doc-id offset into the synthetic batch",
    "q_bloom_sharded" -> "1-row doc-id offset into the synthetic batch",
    "q_temperature_mix" -> "1-row weight-sum normalizer into the per-source rates",
    "q_cms_audit" -> "1-row over-bound-token tally (aggregate excess invariant)",
    "q_corr_screen_hicard" -> "20-row replica frame (hicard universe synthesizer)",
    "q_cms_sharded_audit" -> "1-row over-bound-token tally (aggregate excess invariant)",
    "q_bloom_funnel" -> "1-row doc-id offset into the synthetic batch",
    "q_bloom_audit" -> "1-row doc-id offset into the synthetic batch",
    "q11_important_stock" -> "1-row grand value total for the share threshold",
    "q_abc_classes" -> "1-row grand value total for the class cuts"
  )

  test("no query plans a cartesian product; nested-loop joins are bounded") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    val bnljSeen = scala.collection.mutable.Set.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          fail(s"$name failed to plan: ${e.getMessage}")
        }
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin")) {
        bnljSeen += name
        if (!boundedBnlj.contains(name))
          offenders += s"$name: unexplained BroadcastNestedLoopJoin"
      }
    }
    assert(offenders.isEmpty,
      s"scale-hostile join shapes:\n  ${offenders.mkString("\n  ")}")
    // exactness: a whitelist entry whose query no longer plans a BNLJ
    // is stale documentation — and could silently excuse a future,
    // genuinely unbounded nested loop under the same name
    val stale = boundedBnlj.keySet.diff(bnljSeen)
    assert(stale.isEmpty, s"stale BNLJ allowances (no BNLJ in plan): $stale")
  }
}
