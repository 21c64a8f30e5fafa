package graft

import org.apache.spark.sql.functions._

import graft.functions.{ProductQuantizer, VectorOps}

/** Product quantization: code shape, exactness when the corpus really
  * is a centroid grid, and recall against the brute-force baseline on
  * clustered data.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(13)

  // three well-separated clusters in R^8
  private lazy val centers = Seq(
    Array(10.0, 10, 10, 10, 0, 0, 0, 0),
    Array(0.0, 0, 0, 0, 10, 10, 10, 10),
    Array(-10.0, -10, 10, 10, -10, -10, 10, 10))
  private lazy val vecs = (0L until 90L).map { i =>
    val c = centers((i % 3).toInt)
    (i, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat))
  }.toDF("vec_id", "embedding")

  test("encode emits m-byte codes; codes within a cluster agree more than across") {
    // ksub = #clusters and the first 3 ids hit all three clusters →
    // Lloyd's converges one centroid per prototype (ksub > #prototypes
    // would legitimately split a cluster across twin centroids)
    val model = ProductQuantizer.train(vecs, "vec_id", "embedding", m = 2, ksub = 3, iterations = 5)
    assert(model.m == 2 && model.dsub == 4 && model.codebooks.length == 2)
    val codes = ProductQuantizer.encode(vecs, "vec_id", "embedding", model)
      .as[(Long, Array[Byte])].collect().toMap
    assert(codes.values.forall(_.length == 2))
    // a corpus smaller than the requested ksub clamps the codebook and
    // still trains/queries without indexing past it
    val tiny = vecs.filter($"vec_id" < 5)
    val small = ProductQuantizer.train(tiny, "vec_id", "embedding", m = 2, ksub = 16, iterations = 3)
    assert(small.ksub == 5 && small.codebooks.forall(_.length == 5))
    assert(ProductQuantizer.adcTopK(tiny, "vec_id", "embedding",
      col("vec_id") === 0, small, k = 3).count() == 3)
    // same-cluster vectors should share codes (clusters are separated
    // far beyond the 0.5-sigma noise)
    val byCluster = codes.groupBy { case (id, _) => id % 3 }
    byCluster.values.foreach { grp =>
      val distinct = grp.values.map(_.toSeq).toSet
      assert(distinct.size == 1, s"one code per cluster expected: $distinct")
    }
  }

  test("ivfadcTopK: probed-cell pruning plus residual ADC recovers exact MIPS neighbors") {
    val k = 5
    val raw = vecs.as[(Long, Array[Float])].collect().toMap
    def exactTop(q: Long): Seq[Long] = {
      val qv = raw(q)
      raw.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          (id, v.zip(qv).map { case (a, b) => a.toDouble * b.toDouble }.sum)
        }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
    }
    val got = ProductQuantizer.ivfadcTopK(vecs, "vec_id", "embedding",
        col("vec_id") < 3, kCoarse = 3, coarseIterations = 5,
        m = 4, ksub = 8, pqIterations = 5, nprobe = 1, k = k)
      .as[(Long, Long, Int)].collect().groupBy(_._1)
      .view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(got.keySet == Set(0L, 1L, 2L) && got.values.forall(_.size == k))
    // nprobe=1 on far-separated clusters: every neighbor from the
    // query's own cluster, and recall vs exact MIPS stays high because
    // residual quantization preserves within-cluster ordering better
    // than raw-vector PQ
    got.foreach { case (q, ids) => assert(ids.forall(_ % 3 == q % 3)) }
    val recall = got.map { case (q, ids) =>
      ids.toSet.intersect(exactTop(q).toSet).size.toDouble / k
    }.sum / got.size
    assert(recall >= 0.5, s"IVFADC recall@5 too low: $recall")
  }

  test("adcTopK recall vs brute-force cosine on clustered data") {
    val model = ProductQuantizer.train(vecs, "vec_id", "embedding", m = 4, ksub = 8, iterations = 5)
    val k = 5
    val pred = col("vec_id") < 3
    val exact = VectorOps.knnTopK(vecs, "vec_id", "embedding", pred, k)
      .as[(Long, Long, Int)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val pq = ProductQuantizer.adcTopK(vecs, "vec_id", "embedding", pred, model, k)
      .as[(Long, Long, Int)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(pq.keySet == exact.keySet && pq.values.forall(_.size == k))
    val recall = exact.map { case (q, want) =>
      pq(q).intersect(want).size.toDouble / want.size
    }.sum / exact.size
    // PQ collapses within-cluster detail (neighbors inside a cluster
    // differ only by 0.5-sigma noise the 8-byte code can't resolve), so
    // exact-rank recall is modest; cluster membership is the real
    // contract and is asserted exactly below
    assert(recall >= 0.3, s"recall@5 too low: $recall")
    // every retrieved neighbor is from the query's cluster
    pq.foreach { case (q, ids) => assert(ids.forall(_ % 3 == q % 3)) }
  }

  test("adcRerankTopK with a full-corpus shortlist equals exact kNN") {
    // re-ranking the whole corpus removes the ADC approximation
    // entirely, so result must match brute force ROW FOR ROW (order
    // included) — the contract that makes shortlist depth a pure
    // recall/cost knob
    val model = ProductQuantizer.train(vecs, "vec_id", "embedding", m = 4, ksub = 8, iterations = 5)
    val pred = col("vec_id") < 3
    val exact = VectorOps.knnTopK(vecs, "vec_id", "embedding", pred, 5)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    val rr = ProductQuantizer.adcRerankTopK(vecs, "vec_id", "embedding",
      pred, model, shortlist = 90, k = 5)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(rr == exact)
    // a narrow shortlist still beats raw ADC ordering: every returned
    // neighbor stays in the query's cluster
    val narrow = ProductQuantizer.adcRerankTopK(vecs, "vec_id", "embedding",
      pred, model, shortlist = 10, k = 5)
      .as[(Long, Long, Int)].collect()
    assert(narrow.length == 3 * 5)
    narrow.foreach { case (q, id, _) => assert(id % 3 == q % 3) }
  }
}
