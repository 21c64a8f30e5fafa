package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.operators.CmsOps
import graft.streaming.CmsStream

case class CmsKey(k: String)

/** Count-min sketch: the never-undercount invariant, exactness for an
  * isolated key, mergeability across disjoint batches, the zero-
  * shuffle probe pin, the weighted form, the shape guard — and the
  * streaming store (sum-fold ≡ whole-stream sketch; replay replaces,
  * never double-counts).
  */
class CmsOpsSpec extends SparkSpec {
  import spark.implicits._

  private val W = 256
  private val D = 4

  // skewed stream: key-i appears i+1 times
  private def skewed(n: Int): Seq[CmsKey] =
    (0 until n).flatMap(i => Seq.fill(i + 1)(CmsKey(s"key-$i")))

  test("estimates never undercount; a lone key's estimate is exact") {
    val data = skewed(40)
    val cells = CmsOps.cmsCells(data.toDF(), "k", W, D)
    val exact = data.groupBy(_.k).view.mapValues(_.size.toLong).toMap
    val est = CmsOps
      .estimateBatch(data.map(_.k).distinct.toDF("k"), "k", cells, W, D)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k undercounted: est ${est(k)} < true $n")
    }
    // a single isolated key in its own sketch: min over its cells is
    // exactly its count (nothing else contributes)
    val lone = CmsOps.cmsCells(Seq.fill(9)(CmsKey("solo")).toDF(), "k", W, D)
    val soloEst = CmsOps.estimateBatch(Seq(CmsKey("solo")).toDF(), "k", lone, W, D)
      .as[(String, Long)].head()._2
    assert(soloEst == 9L)
  }

  test("sketches merge: union of per-slice rows re-sums to the whole-stream sketch") {
    val data = skewed(60)
    val (a, b) = data.splitAt(700)
    val merged = CmsOps.cellsArray(
      CmsOps.cmsRows(a.toDF(), "k", W, D)
        .unionByName(CmsOps.cmsRows(b.toDF(), "k", W, D))
        .groupBy(col("__d"), col("__c")).agg(sum(col("__count")).as("__count")),
      W, D)
    val whole = CmsOps.cmsCells(data.toDF(), "k", W, D)
    assert(merged.toSeq == whole.toSeq)
  }

  test("weighted form: mass instead of occurrences") {
    val rows = Seq(("a", 5L), ("a", 7L), ("b", 2L)).toDF("k", "w")
    val cells = CmsOps.cmsCells(rows, "k", W, D, weightCol = Some("w"))
    val est = CmsOps.estimateBatch(Seq("a", "b").toDF("k"), "k", cells, W, D)
      .as[(String, Long)].collect().toMap
    assert(est("a") >= 12L && est("b") >= 2L)
    assert(est("a") + est("b") >= 14L)
  }

  test("estimateBatch is a pure projection: zero exchanges") {
    val cells = CmsOps.cmsCells(Seq(CmsKey("x")).toDF(), "k", W, D)
    val plan = CmsOps.estimateBatch(Seq(CmsKey("x")).toDF(), "k", cells, W, D)
      .queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty)
  }

  test("shape guard raises BY DESIGN past the cell budget; rejects bad shapes") {
    val df = Seq(CmsKey("x")).toDF()
    val e = intercept[IllegalArgumentException] {
      CmsOps.cmsRows(df, "k", width = 1 << 20, depth = 8)
    }
    assert(e.getMessage.contains(graft.api.Guards.Marker))
    intercept[IllegalArgumentException] {
      CmsOps.cmsRows(df, "k", width = 100, depth = 4)
    }
  }

  test("sharded sketch: per-shard rows == unsharded sketch of that shard's keys; estimates agree") {
    val data = skewed(50)
    val nShards = 4
    val shardRows = CmsOps.cmsShardRows(data.toDF(), "k", nShards, W, D)
    (0 until nShards).foreach { s =>
      val mine = data.toDF().filter(CmsOps.shardOf(col("k"), nShards) === s)
      val expect = CmsOps.cmsCells(mine, "k", W, D)
      val got = CmsOps.cellsArray(
        shardRows.filter(col("__shard") === s).select("__d", "__c", "__count"),
        W, D)
      assert(got.toSeq == expect.toSeq, s"shard $s sketch differs")
    }
    // end-to-end: sharded estimates match the key's own shard's
    // unsharded estimate, and still never undercount
    val keys = data.map(_.k).distinct.toDF("k")
    val est = CmsOps.estimateBatchSharded(keys, "k", shardRows, nShards, W, D)
      .as[(String, Long)].collect().toMap
    val exact = data.groupBy(_.k).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"sharded est undercounts $k: ${est(k)} < $n")
    }
  }

  test("stream store: fold of slices == whole-stream sketch; replay replaces") {
    val data = skewed(50)
    val store = java.nio.file.Files.createTempDirectory("cms-store").toString
    val slices = Seq(data.take(400), data.slice(400, 900), data.drop(900))
    slices.zipWithIndex.foreach { case (s, i) =>
      CmsStream.foldBatch(s.toDF(), "k", W, D, store, f"t-$i%09d")
    }
    val folded = CmsStream.readCells(spark, store, W, D)
    val whole = CmsOps.cmsCells(data.toDF(), "k", W, D)
    assert(folded.toSeq == whole.toSeq)
    // crash-replay of batch 1 overwrites its own contribution: counts
    // must NOT double (sum is not idempotent - the partition contract
    // is what makes the replay safe)
    CmsStream.foldBatch(slices(1).toDF(), "k", W, D, store, "t-000000001")
    assert(CmsStream.readCells(spark, store, W, D).toSeq == whole.toSeq)
  }

  test("empty store reads as the zero sketch") {
    val store = java.nio.file.Files.createTempDirectory("cms-empty").toString
    assert(CmsStream.readCells(spark, store, W, D).forall(_ == 0L))
  }
}
