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

  test("deterministic: same rows get the same salt on re-run and repartition") {
    val big = (1 to 500).map(i => ("HOT", i.toLong)).toDF("sym", "v")
    val small = Seq(("HOT", 1)).toDF("sym", "meta")
    val a = SkewOps.saltedJoin(big, small, Seq("sym"), 4).orderBy("v").collect()
    val b = SkewOps.saltedJoin(big.repartition(7), small, Seq("sym"), 4)
      .orderBy("v").collect()
    assert(a.sameElements(b))
  }
}
