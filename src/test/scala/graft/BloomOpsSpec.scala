package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.operators.BloomOps

/** Bloom-filter membership gate: sizing math, the no-false-negative
  * guarantee (the property that makes the prefiltered flag EXACT),
  * equivalence of the prefiltered flag to the plain join flag, the
  * zero-shuffle plan shape of the projection-only probe, and the
  * driver-state guard raising by design.
  */
class BloomOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sizeWords: next power of two over bitsPerKey*keys; floor of one word") {
    assert(BloomOps.sizeWords(0L) == 1)
    assert(BloomOps.sizeWords(1L) == 1)
    // 1000 keys * 10 bits = 10000 bits = 157 words -> 256
    assert(BloomOps.sizeWords(1000L) == 256)
    // exactly at a boundary: 64 keys * 10 = 640 bits = 10 words -> 16
    assert(BloomOps.sizeWords(64L) == 16)
  }

  test("sizeWords raises BY DESIGN (Guards.Marker) past the driver-state budget") {
    val e = intercept[IllegalArgumentException] {
      BloomOps.sizeWords(1000L * 1000L * 1000L)
    }
    assert(e.getMessage.contains(graft.api.Guards.Marker))
    assert(e.getMessage.contains("shard"))
  }

  test("optimalK: round(bitsPerKey * ln 2), floored at 1") {
    assert(BloomOps.optimalK(10) == 7)
    assert(BloomOps.optimalK(8) == 6)
    assert(BloomOps.optimalK(1) == 1)
  }

  test("no false negatives: every inserted key tests positive") {
    val standing = (0 until 500).map(i => s"key-$i").toDF("k")
    val words = BloomOps.bloomWords(standing, "k", numWords = 128, k = 7)
    val flagged = BloomOps.flagBatch(standing, "k", words, k = 7)
    assert(flagged.filter(!col("bloom_hit")).count() == 0L)
  }

  test("false-positive rate on disjoint keys stays near the sized budget") {
    val standing = (0 until 1000).map(i => s"in-$i").toDF("k")
    val probes = (0 until 1000).map(i => s"out-$i").toDF("k")
    val numWords = BloomOps.sizeWords(1000L, bitsPerKey = 10)
    val k = BloomOps.optimalK(10)
    val words = BloomOps.bloomWords(standing, "k", numWords, k)
    val fp = BloomOps.flagBatch(probes, "k", words, k)
      .filter(col("bloom_hit")).count()
    // theoretical fpp ~1% at 10 bits/key; allow generous slack for a
    // single 1000-draw sample (binomial p=0.01 -> P[X > 40] ~ 0)
    assert(fp <= 40L, s"false positives $fp / 1000 far above the ~1% budget")
  }

  test("prefilteredFlag is EXACTLY the plain left-join membership flag") {
    val standing = (0 until 300).map(i => s"doc-$i").toDF("k")
    // batch: 100 members, 100 novels
    val batch = ((0 until 100).map(i => s"doc-${i * 3}") ++
      (0 until 100).map(i => s"novel-$i")).toDF("k")
    val got = BloomOps.prefilteredFlag(batch, standing, "k")
      .select("k", "is_dup").as[(String, Boolean)].collect().toMap
    val want = batch
      .join(standing.distinct().withColumn("__p", lit(true)), Seq("k"), "left")
      .select(col("k"), coalesce(col("__p"), lit(false)).as("is_dup"))
      .as[(String, Boolean)].collect().toMap
    assert(got == want)
    assert(got.count(_._2) == 100)
  }

  test("flagBatch is a pure projection: zero exchanges in the plan") {
    val standing = (0 until 100).map(i => s"key-$i").toDF("k")
    val words = BloomOps.bloomWords(standing, "k", numWords = 64, k = 7)
    val plan = BloomOps.flagBatch(standing, "k", words, k = 7)
      .queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"bloom probe must not shuffle, found: ${exchanges.map(_.nodeName)}")
  }

  test("sharded filter: per-shard rows == the unsharded filter of that shard's keys") {
    val standing = (0 until 400).map(i => s"doc-$i").toDF("k")
    val nShards = 4
    val shardRows = BloomOps.bloomShardRows(standing, "k", nShards,
      wordsPerShard = 64, k = 7)
    (0 until nShards).foreach { s =>
      val mine = standing.filter(BloomOps.shardOf(col("k"), nShards) === s)
      val expect = BloomOps.bloomWords(mine, "k", numWords = 64, k = 7)
      val got = BloomOps.wordsArray(
        shardRows.filter(col("__shard") === s).select("__w", "__bits"), 64)
      assert(got.toSeq == expect.toSeq, s"shard $s filter differs")
    }
  }

  test("sharded gate: no false negatives; confirm makes is_dup exactly the join flag") {
    val standing = (0 until 300).map(i => s"doc-$i").toDF("k")
    val batch = ((0 until 100).map(i => s"doc-${i * 3}") ++
      (0 until 100).map(i => s"novel-$i")).toDF("k")
    val shardRows = BloomOps.bloomShardRows(standing, "k", nShards = 4,
      wordsPerShard = 64, k = 7)
    val flagged = BloomOps.flagBatchSharded(batch, "k", shardRows,
      nShards = 4, wordsPerShard = 64, k = 7)
    // no false negatives: every member key is bloom-positive
    assert(flagged.filter(col("k").startsWith("doc-") && !col("bloom_hit"))
      .count() == 0L)
    val got = BloomOps.confirmFlag(flagged, standing, "k")
      .select("k", "is_dup").as[(String, Boolean)].collect().toMap
    val want = batch
      .join(standing.distinct().withColumn("__p", lit(true)), Seq("k"), "left")
      .select(col("k"), coalesce(col("__p"), lit(false)).as("is_dup"))
      .as[(String, Boolean)].collect().toMap
    assert(got == want)
  }

  test("bloomWords rejects non-power-of-two and oversized word counts") {
    val standing = Seq("a", "b").toDF("k")
    intercept[IllegalArgumentException] {
      BloomOps.bloomWords(standing, "k", numWords = 100, k = 7)
    }
    intercept[IllegalArgumentException] {
      BloomOps.bloomWords(standing, "k", numWords = 64, k = 0)
    }
  }
}
