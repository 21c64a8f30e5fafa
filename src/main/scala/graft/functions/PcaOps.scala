package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * dimensionality-reduction stage a vector pipeline runs before
  * LSH/IVF indexing (fewer dimensions = tighter buckets and cheaper
  * distance math) and the whitening step semantic-dedup recipes
  * normalize with.
  *
  * Shape: ONE distributed pass accumulates per-partition moment
  * sums — count, mean vector, upper-triangular Gram matrix — and only
  * those ≤ (1 + d + d(d+1)/2) doubles per partition reach the driver
  * (the kmeansCentroids convention: vectors never shuffle, model
  * state is bounded). The d×d covariance eigendecomposes on the
  * driver with a cyclic Jacobi sweep — deterministic given its input,
  * O(d³) per sweep at d ≤ 256 is microseconds — and projection is a
  * pure per-row expression (k codegen'd dot products against the
  * component literals, zero shuffle).
  *
  * Determinism note: the moment sums are IEEE doubles accumulated in
  * partition order, so the covariance (and thus the components) can
  * differ in final ulps across partitionings — the audit surface
  * therefore publishes TOLERANCE booleans (orthonormality,
  * eigenvalue ordering, variance accounting), not raw floats; the
  * projection query is rows-only by the same reasoning (the
  * q_approx_distinct / q_cms_counts convention).
  */
object PcaOps {

  /** Fitted model: mean, top-k components (rows = components,
    * orthonormal), their eigenvalues (descending), the covariance
    * trace (total variance), and the fitted row count.
    */
  case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      trace: Double,
      nRows: Long)

  /** Hard cap on the fitted dimensionality: d(d+1)/2 moment sums per
    * partition and an O(d³) driver solve stay trivial to d=256; past
    * that a randomized/iterative method is the right tool, raise by
    * design rather than degrade quietly.
    */
  val MaxDim = 256

  def fit(
      embeddings: DataFrame,
      vecCol: String,
      k: Int
  ): PcaModel = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings
      .select(transform(col(vecCol), x => x.cast("double")).as("vec"))
      .as[Array[Double]]
    require(k >= 1, s"k=$k must be positive")
    // ONE pass: (dim, count, sum_d, upper-tri gram) per partition,
    // tiny driver-side combine (<= 32 partials of ~d^2/2 doubles).
    // Dimensionality comes from the first vector each partition sees
    // (no separate head() job); the driver combine validates that all
    // partitions agreed.
    val partials = vecs.mapPartitions { iter =>
      if (!iter.hasNext) Iterator.empty
      else {
        val first = iter.next()
        val dim = first.length
        require(dim >= 1 && dim <= MaxDim,
          s"${graft.api.Guards.Marker}: dim=$dim outside [1, $MaxDim] — " +
            "use a randomized sketching method past MaxDim")
        var n = 0L
        val s = new Array[Double](dim)
        val g = new Array[Double](dim * (dim + 1) / 2)
        def add(v: Array[Double]): Unit = {
          require(v.length == dim, s"ragged vector: ${v.length} != $dim")
          n += 1
          var i = 0
          var t = 0
          while (i < dim) {
            s(i) += v(i)
            var j = i
            while (j < dim) { g(t) += v(i) * v(j); j += 1; t += 1 }
            i += 1
          }
        }
        add(first)
        iter.foreach(add)
        Iterator.single((dim, n, s, g))
      }
    }.collect()
    require(partials.nonEmpty, "cannot fit PCA on an empty frame")
    val dim = partials.head._1
    require(partials.forall(_._1 == dim),
      s"ragged vectors across partitions: dims ${partials.map(_._1).distinct.mkString(",")}")
    require(k <= dim, s"k=$k outside [1, dim=$dim]")
    val n = partials.map(_._2).sum
    val sum = new Array[Double](dim)
    val gram = new Array[Double](dim * (dim + 1) / 2)
    partials.foreach { case (_, _, s, g) =>
      var i = 0
      while (i < sum.length) { sum(i) += s(i); i += 1 }
      var t = 0
      while (t < gram.length) { gram(t) += g(t); t += 1 }
    }
    val mean = sum.map(_ / n)
    // covariance C[i][j] = gram[i][j]/n - mean_i * mean_j
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = gram(t) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
        t += 1
      }
      i += 1
    }
    val trace = (0 until dim).map(d => cov(d)(d)).sum
    val (vals, vecsM) = jacobiEigen(cov)
    val order = vals.indices.sortBy(d => -vals(d)).take(k)
    PcaModel(
      mean = mean,
      components = order.map(d => vecsM.map(_(d))).toArray,
      eigenvalues = order.map(vals).toArray,
      trace = trace,
      nRows = n)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic (fixed sweep order, fixed convergence threshold).
    * Returns (eigenvalues, eigenvector matrix with eigenvectors in
    * COLUMNS, column d pairing eigenvalue d).
    */
  private[graft] def jacobiEigen(
      sym: Array[Array[Double]],
      maxSweeps: Int = 64
  ): (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val a = Array.tabulate(d, d)((i, j) => sym(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val eps = 1e-14 * math.max(1.0, offDiag(sym) + (0 until d).map(i => math.abs(sym(i)(i))).sum)
    while (sweep < maxSweeps && off > eps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val tSign = if (theta >= 0.0) 1.0 else -1.0
            val tTan = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val s = tTan * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    ((0 until d).map(i => a(i)(i)).toArray, v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += math.abs(a(i)(j)); j += 1 }
      i += 1
    }
    s
  }

  /** ids + the k component scores (`pc0..pc{k-1}`) — a pure per-row
    * projection: the input centers once (zip_with against the mean
    * literal) and each score is one codegen'd dot product against a
    * component literal. Zero shuffle.
    */
  def project(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      model: PcaModel
  ): DataFrame = projectImpl(embeddings, idCol, vecCol, model, whiten = false)

  /** [[project]] with each score divided by √eigenvalue — unit
    * variance per component (the whitening normalization semantic-
    * dedup recipes apply before cosine thresholds, so no direction
    * dominates the similarity). Components with eigenvalue ≤ `floor`
    * (numerically dead directions) publish 0 rather than amplifying
    * noise by a huge 1/√λ.
    */
  def whiten(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      model: PcaModel,
      floor: Double = 1e-12
  ): DataFrame = projectImpl(embeddings, idCol, vecCol, model, whiten = true, floor)

  private def projectImpl(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      model: PcaModel,
      whiten: Boolean,
      floor: Double = 1e-12
  ): DataFrame = {
    val centered = embeddings
      .withColumn("__c", zip_with(
        transform(col(vecCol), x => x.cast("double")),
        typedlit(model.mean),
        (x, m) => x - m))
    val scores = model.components.zipWithIndex.map { case (comp, j) =>
      val raw = VectorOps.dot(col("__c"), typedlit(comp))
      val out =
        if (!whiten) raw
        else if (model.eigenvalues(j) <= floor) lit(0.0)
        else raw / lit(math.sqrt(model.eigenvalues(j)))
      out.as(s"pc$j")
    }
    centered.select(col(idCol) +: scores.toIndexedSeq: _*)
  }
}
