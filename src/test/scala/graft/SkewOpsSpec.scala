package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewOps

/** Salted joins must be result-identical to plain joins while actually
  * spreading a hot key across salt sub-keys.
  */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // one hot key (90% of rows) + a long tail
    val big = ((1 to 900).map(i => ("HOT", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("sym", "v")
    val small = (Seq("HOT") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (s, i) => (s, i * 10) }.toDF("sym", "meta")

    val plain = big.join(small, Seq("sym"))
      .orderBy("sym", "v").collect()
    val salted = SkewOps.saltedJoin(big, small, Seq("sym"), salt = 8)
      .select(big.columns.map(col) :+ col("meta"): _*)
      .orderBy("sym", "v").collect()
    assert(salted.sameElements(plain))
  }

  test("salt actually spreads the hot key across sub-keys") {
    val big = (1 to 1000).map(i => ("HOT", i.toLong)).toDF("sym", "v")
    val salts = big.withColumn(
        "__salt",
        pmod(xxhash64(big.columns.map(col): _*), lit(8L)).cast("int"))
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(salts >= 6, s"expected ~8 distinct salts, got $salts")
  }

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true)") {
    // The engine's first line of defense at 100 TB is Spark's own
    // adaptive skew-join split; saltedJoin is for the cases AQE can't
    // see (aggregations, planned-ahead layouts). Prove the store's
    // joins are eligible: thresholds lowered to test scale.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // incompressible payloads: skew detection reads COMPRESSED
      // shuffle-partition bytes, so constant strings vanish
      def pad(i: Int): String = {
        val md = java.security.MessageDigest.getInstance("MD5")
        (0 until 4).map(s => md.digest(s"$i-$s".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString).mkString
      }
      val big = ((1 to 20000).map(i => ("HOT", pad(i))) ++
        (1 to 200).map(i => (s"k${i % 50}", pad(-i)))).toDF("sym", "v")
      val small = (Seq("HOT") ++ (1 to 50).map(i => s"k$i")).zipWithIndex
        .toDF("sym", "meta")
      // downstream must NOT require the join key's partitioning (a
      // groupBy(sym) would forbid the split); a global agg is free —
      // and summing over v keeps the wide payload inside the join
      val joined = big.join(small, Seq("sym"))
        .agg(count(lit(1)).as("n"), sum(length(col("v"))).as("bytes"))
      // tail keys k1..k49 match the dim 4x each; k0 and k50 don't pair
      assert(joined.collect().head.getLong(0) == 20000L + 196L)
      val finalPlan = joined.queryExecution.executedPlan.toString()
      assert(finalPlan.contains("skew=true"),
        s"AQE should have split the HOT partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("deterministic: same rows get the same salt on re-run and repartition") {
    val big = (1 to 500).map(i => ("HOT", i.toLong)).toDF("sym", "v")
    val small = Seq(("HOT", 1)).toDF("sym", "meta")
    val a = SkewOps.saltedJoin(big, small, Seq("sym"), 4).orderBy("v").collect()
    val b = SkewOps.saltedJoin(big.repartition(7), small, Seq("sym"), 4)
      .orderBy("v").collect()
    assert(a.sameElements(b))
  }
}
