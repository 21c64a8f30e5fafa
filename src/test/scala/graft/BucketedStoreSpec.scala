package graft

import graft.sources.BucketedStore

class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key join plans with zero shuffle exchanges") {
    val li = (1L to 2000L).map(k => (k % 400, k, 1.5 * (k % 7))).toDF("k", "id", "v")
    val o = (1L to 400L).map(k => (k, s"o$k")).toDF("k", "name")
    spark.sql("DROP TABLE IF EXISTS b_li")
    spark.sql("DROP TABLE IF EXISTS b_o")
    BucketedStore.writeBucketed(li, "b_li", Seq("k"), 8, Seq("k"))
    BucketedStore.writeBucketed(o, "b_o", Seq("k"), 8, Seq("k"))

    val joined = BucketedStore.bucketedJoin(spark, "b_li", "b_o", Seq("k"))
    // disable broadcast so the co-location (not a broadcast) is what
    // kills the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      // li keys are 0..399 (k % 400), o keys are 1..400 → k=0 rows drop
      assert(joined.count() == 1995)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hyperplane LSH catches planted near-dups within buckets") {
    import graft.functions.VectorOps
    val rng = new scala.util.Random(7)
    val base = Array.fill(16)(rng.nextGaussian().toFloat)
    val nearDup = base.zipWithIndex.map { case (v, i) => if (i == 0) v + 0.01f else v }
    val others = (0 until 50).map(i => Array.fill(16)(rng.nextGaussian().toFloat))
    val vecs = ((0L, base) +: (1L, nearDup) +: others.zipWithIndex.map {
      case (v, i) => ((i + 2).toLong, v)
    }).toDF("vec_id", "embedding")

    val pairs = VectorOps.lshNearDupPairs(vecs, "vec_id", "embedding",
        dim = 16, nPlanes = 8, threshold = 0.99)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    // random vectors in 16-dim almost never reach cosine 0.99
    assert(pairs.size <= 2)
  }

  test("hyperplane bucket expression matches the literal-plane formulation, plan O(1) in dim") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps
    val vecs = (0L until 40L).map { i =>
      val r = new scala.util.Random(i)
      (i, Array.fill(16)(r.nextGaussian()))
    }.toDF("id", "vec")
    // the exact plane matrix hyperplaneBucket(seed=42) generates
    val rng = new scala.util.Random(42L)
    val planes = Array.fill(6)(Array.fill(16)(rng.nextGaussian()))
    val viaExpr = vecs.select($"id", VectorOps.hyperplaneBucket($"vec", 16, 6).as("b"))
      .as[(Long, Int)].collect().toMap
    val viaLits = vecs.select($"id",
      (0 until 6).map { j =>
        when(VectorOps.dot($"vec", array(planes(j).map(lit): _*)) > 0d, lit(1 << j))
          .otherwise(lit(0))
      }.reduce(_ + _).as("b")).as[(Long, Int)].collect().toMap
    assert(viaExpr == viaLits)
    assert(viaExpr.values.toSet.size > 1) // buckets actually split
    // plan size must not grow with dim x nPlanes (the matrix is
    // expression data, not literal nodes)
    def planLen(dim: Int, n: Int): Int = {
      val v = (0L until 2L).map(i => (i, Array.fill(dim)(0.5))).toDF("id", "vec")
      v.select(VectorOps.hyperplaneBucket($"vec", dim, n))
        .queryExecution.analyzed.toString.length
    }
    assert(math.abs(planLen(1024, 16) - planLen(16, 4)) < 200)
  }
}
