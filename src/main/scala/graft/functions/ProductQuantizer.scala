package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fitted product quantizer: `m` subspaces of `dsub` dims, `ksub`
  * centroids each. `codebooks(j)(c)` is centroid c of subspace j.
  * Top-level (not nested) so Encoders and broadcast serialization work.
  */
final case class PqModel(
    m: Int,
    ksub: Int,
    dsub: Int,
    codebooks: Array[Array[Array[Double]]]) {
  /** Per-centroid squared norms, for reconstructed-vector norms. */
  def centroidNorm2: Array[Array[Double]] =
    codebooks.map(_.map(c => { var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s }))
}

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-bound ANN scale
  * path: vectors compress from D floats to m bytes (64×4 B → 8 B here),
  * so a 100 TB embedding corpus scans as ~3 TB of codes, and query
  * scoring is m table lookups instead of D multiplies.
  *
  * Spark shapes:
  *  - [[train]]: Lloyd's over ALL m subspaces in one pass — each
  *    iteration is ONE job whose per-partition combiner accumulates
  *    (subspace, centroid) → (count, sumVec); the shuffle carries at
  *    most m×ksub×P tiny rows and the collect is m×ksub rows (bounded
  *    like k-means' k centroids). Deterministic: seeded from the first
  *    ksub vectors by id, first-minimum tie-break.
  *  - [[encode]]: broadcast codebooks + mapPartitions projection,
  *    (id, m-byte code) out, no shuffle.
  *  - [[adcTopK]]: queries broadcast; each partition builds per-query
  *    distance tables once (m×ksub dot products), scans its codes with
  *    m byte-lookups per row, keeps a local top-k heap, and emits only
  *    P×k candidate rows to the final per-query ranking — the code
  *    corpus itself never shuffles.
  *
  * Similarity is cosine against the RECONSTRUCTED vector (ADC dot over
  * lookup tables, norm from per-centroid norms), ranked like
  * [[VectorOps.knnTopK]] so the exact scan is its recall baseline.
  */
object ProductQuantizer {

  def train(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ksub: Int,
      iterations: Int
  ): PqModel = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings.select(
        col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("vec"))
      .as[(Long, Array[Double])]
    trainOnVecs(vecs, m, ksub, iterations)
  }

  /** Train over an already-typed vector dataset (also the entry point
    * for residual training in [[ivfadcTopK]]).
    */
  private[graft] def trainOnVecs(
      vecs: org.apache.spark.sql.Dataset[(Long, Array[Double])],
      m: Int,
      ksub: Int,
      iterations: Int
  ): PqModel = {
    val spark = vecs.sparkSession
    import spark.implicits._
    require(m > 0 && iterations > 0, s"m=$m and iterations=$iterations must be positive")
    // codes are one byte per subspace — more than 256 centroids would
    // silently alias under the & 0xff decode
    require(ksub >= 1 && ksub <= 256, s"ksub=$ksub must be in [1, 256]")

    val first = vecs.take(1)
    require(first.nonEmpty, "PQ training needs at least one vector")
    val dim = first.head._2.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m

    // deterministic seed: subspace j's centroids from the first ksub
    // ids; a corpus smaller than ksub clamps the codebook (PqModel.ksub
    // must equal the real codebook size or ADC tables index past it)
    // — order by the id column whatever its name (named frames use
    // "id", tuple-shaped residual datasets use "_1")
    val seed = vecs.orderBy(vecs.columns.head).limit(ksub).collect().map(_._2)
    require(seed.nonEmpty, "PQ training needs at least one vector")
    val ksubEff = seed.length
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => seed.map(v => v.slice(j * dsub, (j + 1) * dsub)))

    var it = 1
    while (it < iterations) {
      val bc = spark.sparkContext.broadcast(codebooks)
      val partials = vecs.mapPartitions { iter =>
        val cbs = bc.value
        val c2 = cbs.map(_.map(c => { var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s }))
        val counts = Array.ofDim[Long](m, ksubEff)
        val sums = Array.ofDim[Double](m, ksubEff, dsub)
        iter.foreach { case (_, v) =>
          var j = 0
          while (j < m) {
            val c = nearestSub(v, j * dsub, dsub, cbs(j), c2(j))
            counts(j)(c) += 1
            var d = 0
            while (d < dsub) { sums(j)(c)(d) += v(j * dsub + d); d += 1 }
            j += 1
          }
        }
        for {
          j <- (0 until m).iterator
          c <- (0 until ksubEff).iterator if counts(j)(c) > 0
        } yield (j * ksubEff + c, (counts(j)(c), sums(j)(c)))
      }
      val totals = partials
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          val s = new Array[Double](dsub)
          var d = 0
          while (d < dsub) { s(d) = a._2._2(d) + b._2._2(d); d += 1 }
          (a._1, (a._2._1 + b._2._1, s))
        }
        .map { case (jc, (_, (n, s))) => (jc, n, s) }
        .collect()
      bc.destroy()
      val merged = codebooks.map(_.map(_.clone()))
      totals.foreach { case (jc, n, s) =>
        merged(jc / ksubEff)(jc % ksubEff) = s.map(_ / n)
      }
      codebooks = merged
      it += 1
    }
    PqModel(m, ksubEff, dsub, codebooks)
  }

  /** (id, code) — `code` is the m-byte PQ code as a binary column. */
  def encode(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      model: PqModel
  ): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    embeddings.select(
        col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("vec"))
      .as[(Long, Array[Double])]
      .mapPartitions { iter =>
        val mdl = bc.value
        val c2 = mdl.centroidNorm2
        iter.map { case (id, v) => (id, encodeOne(v, mdl, c2)) }
      }
      .toDF("id", "code")
  }

  /** ADC top-k: contract of [[VectorOps.knnTopK]] (query_id,
    * neighbor_id, rank) but scored over PQ codes.
    */
  def adcTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: org.apache.spark.sql.Column,
      model: PqModel,
      k: Int
  ): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val queries: Array[(Long, Array[Double])] = embeddings
      .filter(queryPred)
      .select(col(idCol).cast("long"), transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Array[Double])]
      .collect()
    val bcq = spark.sparkContext.broadcast(queries)
    val bcm = spark.sparkContext.broadcast(model)

    val candidates = encode(embeddings, idCol, vecCol, model)
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val mdl = bcm.value
        val qs = bcq.value
        val c2 = mdl.centroidNorm2
        // per-query lookup tables: dot(q_j, centroid) per (j, centroid)
        val dt = qs.map { case (_, q) =>
          Array.tabulate(mdl.m, mdl.ksub) { (j, c) =>
            val cen = mdl.codebooks(j)(c)
            var s = 0.0; var d = 0
            while (d < mdl.dsub) { s += q(j * mdl.dsub + d) * cen(d); d += 1 }
            s
          }
        }
        val qnorm = qs.map { case (_, q) =>
          math.sqrt({ var s = 0.0; var i = 0; while (i < q.length) { s += q(i) * q(i); i += 1 }; s })
        }
        // local top-k per query; dequeue evicts the least-preferred
        // candidate (lowest sim, then largest id — matching the final
        // (sim desc, id asc) ranking so boundary ties survive)
        val heaps = Array.fill(qs.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
            Ordering.by[(Double, Long), (Double, Long)](x => (-x._1, x._2))))
        iter.foreach { case (id, code) =>
          var qi = 0
          while (qi < qs.length) {
            if (qs(qi)._1 != id) {
              var dot = 0.0; var rec2 = 0.0; var j = 0
              while (j < mdl.m) {
                val c = code(j) & 0xff
                dot += dt(qi)(j)(c)
                rec2 += c2(j)(c)
                j += 1
              }
              val sim = if (rec2 == 0.0 || qnorm(qi) == 0.0) 0.0
                        else dot / (qnorm(qi) * math.sqrt(rec2))
              val h = heaps(qi)
              h.enqueue((sim, id))
              if (h.size > k) h.dequeue()
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (sim, id) => (qs(qi)._1, id, sim) }
        }
      }
      .toDF("query_id", "id", "__sim")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("__sim").desc, col("id"))
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"))
  }

  /** ADC shortlist + exact re-rank — the standard two-stage ANN serving
    * shape (Jégou et al. §VII "re-ranking"): the compressed-domain ADC
    * scan proposes `shortlist` candidates per query, then ONLY those
    * rows are re-scored with the true cosine on the raw vectors and
    * cut to `k`. Recovers exact-metric ordering wherever the true
    * top-k survives the shortlist, at a raw-vector read cost of
    * O(queries × shortlist) instead of O(queries × corpus).
    *
    * Scale: stage 1 touches m-byte codes only; stage 2's vector
    * fetch is a semi-join on the P×shortlist candidate ids against
    * the corpus (shuffle carries shortlist rows per query, the scan
    * prunes to matching ids), with queries broadcast exactly as in
    * [[graft.functions.VectorOps.knnTopK]].
    */
  def adcRerankTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: org.apache.spark.sql.Column,
      model: PqModel,
      shortlist: Int,
      k: Int
  ): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must cover k=$k")
    val sl = adcTopK(embeddings, idCol, vecCol, queryPred, model, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val corpus = embeddings
      .select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("__v"))
      .withColumn("__vnorm", VectorOps.norm(col("__v")))
    val queries = embeddings
      .filter(queryPred)
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qnorm", VectorOps.norm(col("__qv")))
    val exact = sl
      .join(corpus, "neighbor_id")
      .join(broadcast(queries), "query_id")
      .withColumn("__sim",
        VectorOps.dot(col("__v"), col("__qv")) /
          (col("__vnorm") * col("__qnorm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("__sim").desc, col("neighbor_id"))
    exact
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** IVFADC (the full architecture of Jégou et al. §V): a coarse
    * k-means quantizer prunes the corpus to `nprobe` probed cells per
    * query, and PQ codes of the RESIDUAL (vector − coarse centroid)
    * are scored with ADC inside those cells only. Ranking is by
    * approximate inner product — dot(q, centroid) + Σ_j dot(q_j,
    * decode_j) — so every term comes from a lookup table (a cosine
    * variant would need |centroid + residual| cross-terms; MIPS is the
    * standard IVFADC contract).
    *
    * Scale: scan work ≈ (nprobe / kCoarse) of the code corpus, memory
    * m bytes/vector, shuffle P×k candidate rows. Training = coarse
    * Lloyd's (one job/iter) + residual PQ (one job/iter); both collect
    * only centroid tables.
    */
  def ivfadcTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: org.apache.spark.sql.Column,
      kCoarse: Int,
      coarseIterations: Int,
      m: Int,
      ksub: Int,
      pqIterations: Int,
      nprobe: Int,
      k: Int
  ): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings.select(
        col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("vec"))
      .as[(Long, Array[Double])]

    val coarse = VectorOps.kmeansCentroids(embeddings, idCol, vecCol, kCoarse, coarseIterations)
    val bcCoarse = spark.sparkContext.broadcast(coarse)

    // materialized once: residual training iterates over it and the
    // encode pass reads it again
    val residuals = vecs.mapPartitions { iter =>
      val cs = bcCoarse.value
      val c2 = cs.map(c => { var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s })
      iter.map { case (id, v) =>
        val cl = nearestFull(v, cs, c2)
        val r = new Array[Double](v.length)
        var d = 0
        while (d < v.length) { r(d) = v(d) - cs(cl)(d); d += 1 }
        (id, cl, r)
      }
    }.localCheckpoint()

    val model = trainOnVecs(residuals.map(t => (t._1, t._3)), m, ksub, pqIterations)
    val bcModel = spark.sparkContext.broadcast(model)
    val coded = residuals.mapPartitions { iter =>
      val mdl = bcModel.value
      val c2 = mdl.centroidNorm2
      iter.map { case (id, cl, r) => (id, cl, encodeOne(r, mdl, c2)) }
    }

    val queries: Array[(Long, Array[Double])] = embeddings
      .filter(queryPred)
      .select(col(idCol).cast("long"), transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Array[Double])]
      .collect()
    val bcq = spark.sparkContext.broadcast(queries)

    val candidates = coded.mapPartitions { iter =>
      val mdl = bcModel.value
      val qs = bcq.value
      val cs = bcCoarse.value
      // per query: probed cluster set (top-nprobe by dot, ties → lower
      // cluster id), coarse dot per probed cluster, residual ADC tables
      val probed = qs.map { case (_, q) =>
        val dots = cs.map { c =>
          var s = 0.0; var d = 0
          while (d < c.length) { s += q(d) * c(d); d += 1 }
          s
        }
        dots.zipWithIndex.sortBy { case (s, i) => (-s, i) }.take(nprobe)
          .map { case (s, i) => (i, s) }.toMap
      }
      val dt = qs.map { case (_, q) =>
        Array.tabulate(mdl.m, mdl.ksub) { (j, c) =>
          val cen = mdl.codebooks(j)(c)
          var s = 0.0; var d = 0
          while (d < mdl.dsub) { s += q(j * mdl.dsub + d) * cen(d); d += 1 }
          s
        }
      }
      val heaps = Array.fill(qs.length)(
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
          Ordering.by[(Double, Long), (Double, Long)](x => (-x._1, x._2))))
      iter.foreach { case (id, cl, code) =>
        var qi = 0
        while (qi < qs.length) {
          if (qs(qi)._1 != id) {
            probed(qi).get(cl) match {
              case Some(coarseDot) =>
                var s = coarseDot
                var j = 0
                while (j < mdl.m) { s += dt(qi)(j)(code(j) & 0xff); j += 1 }
                val h = heaps(qi)
                h.enqueue((s, id))
                if (h.size > k) h.dequeue()
              case None => ()
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (s, id) => (qs(qi)._1, id, s) }
      }
    }.toDF("query_id", "id", "__sim")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("__sim").desc, col("id"))
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"))
  }

  // argmin over full-dimension centroids (coarse assignment)
  private def nearestFull(
      v: Array[Double], cents: Array[Array[Double]], c2: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var dot = 0.0
      var d = 0
      while (d < c.length) { dot += v(d) * c(d); d += 1 }
      val dist = c2(j) - 2.0 * dot
      if (dist < bestD) { bestD = dist; best = j }
      j += 1
    }
    best
  }

  private[graft] def encodeOne(
      v: Array[Double], mdl: PqModel, c2: Array[Array[Double]]): Array[Byte] = {
    val code = new Array[Byte](mdl.m)
    var j = 0
    while (j < mdl.m) {
      code(j) = nearestSub(v, j * mdl.dsub, mdl.dsub, mdl.codebooks(j), c2(j)).toByte
      j += 1
    }
    code
  }

  // argmin_c |v_sub - c|^2 via |c|^2 - 2 v·c (|v|^2 constant); first
  // minimum wins — deterministic
  private def nearestSub(
      v: Array[Double], off: Int, dsub: Int,
      cents: Array[Array[Double]], c2: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var dot = 0.0
      var d = 0
      while (d < dsub) { dot += v(off + d) * cents(c)(d); d += 1 }
      val dist = c2(c) - 2.0 * dot
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    best
  }
}
