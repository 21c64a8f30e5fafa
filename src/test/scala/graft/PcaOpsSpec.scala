package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.functions.PcaOps

/** PCA: Jacobi exactness on a hand-solvable matrix, recovery of a
  * planted dominant axis, orthonormal components, eigenvalue/variance
  * bookkeeping, the zero-shuffle projection pin, the dim guard, and
  * fit determinism under a fixed partitioning.
  */
class PcaOpsSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen solves a hand-checkable symmetric 2x2 exactly") {
    // [[2, 1], [1, 2]] -> eigenvalues 3 and 1, vectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (vals, vecs) = PcaOps.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    val hi = if (vals(0) > vals(1)) 0 else 1
    val v = Array(vecs(0)(hi), vecs(1)(hi))
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v(0) - v(1)) < 1e-12, "top eigenvector of [[2,1],[1,2]] is (1,1) dir")
  }

  // planted data: dominant variance along e0 (scale 10), medium along
  // e1 (scale 2), tiny deterministic wobble elsewhere
  private def planted(n: Int, dim: Int) =
    (0 until n).map { i =>
      val v = new Array[Double](dim)
      v(0) = 10.0 * math.sin(i * 0.7)
      v(1) = 2.0 * math.cos(i * 1.3)
      var d = 2
      while (d < dim) { v(d) = 0.01 * math.sin(i * 0.1 + d); d += 1 }
      (i.toLong, v.map(_.toFloat))
    }

  test("fit recovers the planted dominant axis; components orthonormal; eigs ordered") {
    val emb = planted(500, 8).toDF("vec_id", "embedding").coalesce(4)
    val m = PcaOps.fit(emb, "embedding", k = 3)
    // component 0 aligns with e0 (up to sign)
    assert(math.abs(m.components(0)(0)) > 0.999,
      s"pc0 not aligned with the planted axis: ${m.components(0).toSeq}")
    assert(math.abs(m.components(1)(1)) > 0.99)
    // orthonormal rows
    for (a <- 0 until 3; b <- 0 until 3) {
      val d = m.components(a).zip(m.components(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(d - (if (a == b) 1.0 else 0.0)) < 1e-9, s"WWt[$a][$b]=$d")
    }
    assert(m.eigenvalues(0) >= m.eigenvalues(1) &&
      m.eigenvalues(1) >= m.eigenvalues(2))
    assert(m.eigenvalues.sum <= m.trace + 1e-9)
  }

  test("distributed projection variance matches the driver eigenvalues") {
    val emb = planted(400, 6).toDF("vec_id", "embedding").coalesce(4)
    val m = PcaOps.fit(emb, "embedding", k = 2)
    val vars = PcaOps.project(emb, "vec_id", "embedding", m)
      .agg(var_pop(col("pc0")), var_pop(col("pc1"))).head()
    assert(math.abs(vars.getDouble(0) - m.eigenvalues(0)) < 1e-8 * m.eigenvalues(0))
    assert(math.abs(vars.getDouble(1) - m.eigenvalues(1)) < 1e-8 * math.max(1e-9, m.eigenvalues(1)))
  }

  test("whitened scores have unit variance; dead directions publish 0") {
    val emb = planted(400, 6).toDF("vec_id", "embedding").coalesce(4)
    val m = PcaOps.fit(emb, "embedding", k = 2)
    val vars = PcaOps.whiten(emb, "vec_id", "embedding", m)
      .agg(var_pop(col("pc0")), var_pop(col("pc1"))).head()
    assert(math.abs(vars.getDouble(0) - 1.0) < 1e-8)
    assert(math.abs(vars.getDouble(1) - 1.0) < 1e-8)
    // a constant (zero-variance) direction must not be amplified
    val flat = (0 until 50).map(i => (i.toLong, Array(i.toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    val mf = PcaOps.fit(flat, "embedding", k = 2)
    val w = PcaOps.whiten(flat, "vec_id", "embedding", mf)
      .agg(max(abs(col("pc1")))).head().getDouble(0)
    assert(w == 0.0, s"dead direction amplified: $w")
  }

  test("projection is a pure projection: zero exchanges") {
    val emb = planted(50, 4).toDF("vec_id", "embedding")
    val m = PcaOps.fit(emb, "embedding", k = 2)
    val plan = PcaOps.project(emb, "vec_id", "embedding", m)
      .queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty)
  }

  test("fit is deterministic for a fixed partitioning") {
    val emb = planted(300, 5).toDF("vec_id", "embedding").coalesce(3)
    val m1 = PcaOps.fit(emb, "embedding", k = 2)
    val m2 = PcaOps.fit(emb, "embedding", k = 2)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
  }

  test("dim guard raises BY DESIGN past MaxDim") {
    val emb = Seq((1L, Array.fill(300)(1.0f))).toDF("vec_id", "embedding")
    // the guard now fires inside the single fit pass (executor side),
    // so it surfaces wrapped in Spark's task-failure exception
    val e = intercept[Throwable] {
      PcaOps.fit(emb, "embedding", k = 2)
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains(graft.api.Guards.Marker)))
  }
}
