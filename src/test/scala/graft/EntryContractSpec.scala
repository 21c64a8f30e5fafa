package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants for SparkEntry that the compiler cannot
  * enforce: Scala Map literals silently drop duplicate keys (a
  * duplicated query name shadows the earlier definition — this bit us
  * once), and every oracle must refer to a defined query.
  */
class EntryContractSpec extends AnyFunSuite {

  test("every oracle key has a query; oracle-less queries are known rows-only ops") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
    val rowsOnly = q.diff(o)
    // engine-defined results (sketches, seeded planes, Lloyd's
    // codebooks, deflate, BPE merges) — keep this list deliberate.
    // q_knn_kmeans_ivf / q_knn_ivf_probe / q_pq_topk / q_lsh_neardup
    // left this list in round 5: pinning their quantizers / planes at
    // the deterministic seed made them SQL-reproducible.
    assert(rowsOnly == Set(
      "q_approx_distinct", "q_approx_percentiles",
      "q_ivfadc_topk", "q_bpe_tokens", "q_compress_ratio",
      "q_sketch_store", "q_bloom_funnel", "q_cms_counts", "q_pca_project"),
      s"unexpected rows-only set: $rowsOnly")
  }

  test("no query or oracle name is defined twice in the source (shadowing)") {
    val src = scala.io.Source.fromFile("src/main/scala/graft/SparkEntry.scala", "UTF-8")
    val text = try src.mkString finally src.close()
    val defs = "\"(q[a-z0-9_]+)\" ->".r.findAllMatchIn(text).map(_.group(1)).toSeq
    val over = defs.groupBy(identity).view.mapValues(_.size).filter(_._2 > 2)
    assert(over.isEmpty,
      s"names defined more than twice (query + oracle = 2 is the max): ${over.toMap}")
    // and each name bound at most once per map: total defs must equal
    // queries-map size + oracle-map size
    assert(defs.size == SparkEntry.queries.size + SparkEntry.oracleSql.size,
      s"${defs.size} source bindings vs ${SparkEntry.queries.size} queries + " +
        s"${SparkEntry.oracleSql.size} oracles — a duplicate key is shadowing an entry")
  }
}
