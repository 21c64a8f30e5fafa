package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextOps, VectorOps, Winnowing}
import graft.operators.{CapReport, EntityOps, MicrostructureOps, MultimodalOps}

/** Cap observability (round-11 verdict item 2): every banded /
  * clustered near-dup operator drops over-cap buckets silently, so a
  * capped run's pair output is indistinguishable from a clean run's.
  * These specs pin the companion `*CapReport` surface: a capped run
  * IS distinguishable (nonzero `n_capped_buckets` /
  * `n_entities_affected`), a clean run reports zeros, and the
  * report's drop accounting agrees with what the operator actually
  * drops.
  */
class CapReportSpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect()
    assert(r.length == 1, s"cap report must be one row, got ${r.length}")
    r.head
  }

  test("CapReport.of: capped vs clean runs are distinguishable; accounting is exact") {
    // bucket A holds 3 ids (over a cap of 2), bucket B holds 2, C holds 1
    val banded = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"),
      (3L, "B"), (4L, "B"),
      (5L, "C")).toDF("id", "bucket")
    val capped = row(CapReport.of(banded, Seq("bucket"), "id", cap = 2))
    assert(capped.getAs[Long]("n_buckets") == 3L)
    assert(capped.getAs[Long]("n_capped_buckets") == 1L)
    assert(capped.getAs[Long]("n_rows_dropped") == 3L)
    // id 3 sits in capped A and clean B: affected, not annihilated
    assert(capped.getAs[Long]("n_entities_affected") == 3L)
    assert(capped.getAs[Long]("max_bucket_n") == 3L)

    val clean = row(CapReport.of(banded, Seq("bucket"), "id", cap = 10))
    assert(clean.getAs[Long]("n_capped_buckets") == 0L)
    assert(clean.getAs[Long]("n_rows_dropped") == 0L)
    assert(clean.getAs[Long]("n_entities_affected") == 0L)
    assert(clean.getAs[Long]("n_buckets") == 3L && clean.getAs[Long]("max_bucket_n") == 3L)

    val empty = row(CapReport.of(banded.limit(0), Seq("bucket"), "id", cap = 2))
    assert(empty.getAs[Long]("n_buckets") == 0L && empty.getAs[Long]("max_bucket_n") == 0L)
  }

  /** Five identical docs + two unrelated ones: every band bucket the
    * identical docs share holds 5 members.
    */
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox jumps over the lazy dog again and again"),
    (4L, "the quick brown fox jumps over the lazy dog again and again"),
    (5L, "the quick brown fox jumps over the lazy dog again and again"),
    (6L, "completely different text about distributed query engines"),
    (7L, "yet another unrelated sentence mentioning benchmark suites"))
    .toDF("doc_id", "text")

  test("a capped minhash run loses pairs AND the report says so; clean cap reports zero") {
    val cleanPairs = TextOps.minhashCandidatePairs(
      docs, "doc_id", "text", bands = 4, rowsPerBand = 2, shingleSize = 3,
      bucketCap = 100L).count()
    val cappedPairs = TextOps.minhashCandidatePairs(
      docs, "doc_id", "text", bands = 4, rowsPerBand = 2, shingleSize = 3,
      bucketCap = 4L).count()
    assert(cleanPairs == 10L, s"5 identical docs must pair fully, got $cleanPairs")
    assert(cappedPairs == 0L, "the cap must have silently dropped the pairs")

    val r = row(TextOps.minhashCapReport(
      docs, "doc_id", "text", bands = 4, rowsPerBand = 2, shingleSize = 3,
      bucketCap = 4L))
    assert(r.getAs[Long]("n_capped_buckets") >= 1L,
      "the silent drop must be visible in the report")
    assert(r.getAs[Long]("n_entities_affected") == 5L)
    assert(r.getAs[Long]("max_bucket_n") == 5L)

    val ok = row(TextOps.minhashCapReport(
      docs, "doc_id", "text", bands = 4, rowsPerBand = 2, shingleSize = 3,
      bucketCap = 100L))
    assert(ok.getAs[Long]("n_capped_buckets") == 0L &&
      ok.getAs[Long]("n_entities_affected") == 0L)
  }

  test("simhash / winnow / fp64 / entity-blocking / media reports carry the contract") {
    val sim = row(TextOps.simhashCapReport(docs, "doc_id", "text", bucketCap = 4L))
    assert(sim.getAs[Long]("n_capped_buckets") >= 1L &&
      sim.getAs[Long]("n_entities_affected") == 5L)

    val win = row(Winnowing.winnowCapReport(docs, "doc_id", "text",
      k = 3, w = 4, bucketCap = 4L))
    assert(win.getAs[Long]("n_capped_buckets") >= 1L &&
      win.getAs[Long]("n_entities_affected") == 5L)

    val names = Seq("ann smith", "bob smith", "cid smith", "dee smith", "ann jones")
      .toDF("name")
    val ent = row(EntityOps.blockingCapReport(names, "name", bucketCap = 3))
    // the 'smith' last-token block holds 4 names > cap 3
    assert(ent.getAs[Long]("n_capped_buckets") == 1L &&
      ent.getAs[Long]("n_entities_affected") == 4L)

    val hashes = Seq((1L, 42L), (2L, 42L), (3L, 42L), (4L, 1L << 40))
      .toDF("media_id", "dhash")
    val img = row(MultimodalOps.imageNearDupCapReport(hashes, bucketCap = 2L))
    // three identical dhashes share all 4 band buckets; the fourth
    // hash joins them in the zero-valued high bands (1L<<40 only
    // differs in band 2), so all four ids are affected
    assert(img.getAs[Long]("n_capped_buckets") == 4L &&
      img.getAs[Long]("n_entities_affected") == 4L)
    val vid = row(MultimodalOps.videoNearDupCapReport(hashes, bucketCap = 2L))
    assert(vid.getAs[Long]("n_capped_buckets") == 1L &&
      vid.getAs[Long]("n_entities_affected") == 3L)
  }

  test("cluster cap report gauges the blocked (exact) cosine path") {
    // 4 vectors in one cluster, all identical: through r12 a cap of 3
    // EMPTIED the pair set (the r11 sf10 trap); since r13 the cluster
    // sub-shards into block pairs instead, so all 6 pairs survive and
    // the report reads as a cost gauge, not a recall alarm
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), "c1"), (2L, Array(1.0f, 0.0f), "c1"),
      (3L, Array(1.0f, 0.0f), "c1"), (4L, Array(1.0f, 0.0f), "c1"),
      (5L, Array(0.0f, 1.0f), "c2")).toDF("vec_id", "embedding", "label")
    val pairs = VectorOps.cosineNearDupPairs(
        emb, "vec_id", "embedding", "label", threshold = 0.9, clusterCap = 3L)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)),
      s"blocked path must keep every within-cluster pair: $pairs")
    val r = row(VectorOps.clusterCapReport(emb, "vec_id", "label", clusterCap = 3L))
    assert(r.getAs[Long]("n_buckets") == 2L &&
      r.getAs[Long]("n_split_buckets") == 1L &&
      r.getAs[Long]("n_split_blocks") == 2L && // ceil(4/3)
      r.getAs[Long]("max_bucket_n") == 4L &&
      r.getAs[Long]("n_pair_comparisons") == 6L)
    val clean = row(VectorOps.clusterCapReport(emb, "vec_id", "label", clusterCap = 10L))
    assert(clean.getAs[Long]("n_split_buckets") == 0L &&
      clean.getAs[Long]("n_split_blocks") == 0L)
    // cap <= 0 is documented single-block mode: NOTHING splits, so the
    // split columns must read 0 (not count every non-empty bucket),
    // while the cost gauge still prices the all-pairs bill
    val single = row(VectorOps.clusterCapReport(emb, "vec_id", "label", clusterCap = 0L))
    assert(single.getAs[Long]("n_buckets") == 2L &&
      single.getAs[Long]("n_split_buckets") == 0L &&
      single.getAs[Long]("n_split_blocks") == 0L &&
      single.getAs[Long]("max_bucket_n") == 4L &&
      single.getAs[Long]("n_pair_comparisons") == 6L)
  }

  test("corrScreen cap report windows on the same band key as the screen") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def series(k: String, sign: Int => Int) = (0 until 40).map { i =>
      val px = 100.0 + 0.01 * (0 to i).map(sign).sum
      (k, new java.sql.Timestamp(t0 + i * 3600000L), px, px, px, px, 1L, 1.0)
    }
    val same = (i: Int) => if (i % 2 == 0) 1 else -1
    val df = (series("a", same) ++ series("b", same) ++ series("c", same))
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    // three identical fingerprints: every 8-bit band bucket holds 3
    val r = row(MicrostructureOps.corrScreenCapReport(
      df, "sym", "bucket_ts", bandBits = 8, bucketCap = 2L))
    assert(r.getAs[Long]("n_capped_buckets") == 8L &&
      r.getAs[Long]("n_entities_affected") == 3L)
    val clean = row(MicrostructureOps.corrScreenCapReport(
      df, "sym", "bucket_ts", bandBits = 8, bucketCap = 10L))
    assert(clean.getAs[Long]("n_capped_buckets") == 0L)
  }
}
