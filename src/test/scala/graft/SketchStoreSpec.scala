package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.SketchStore

/** Mergeable sketch store: the union of per-day HLL sketches estimates
  * within the sketch error bound of a direct single-pass sketch (the
  * merge drops the order-dependent HIP estimator, and the estimate can
  * shift within the bound under a different merge tree — exact
  * equality is NOT the contract), the binary states survive a parquet
  * round-trip bit-for-bit, and the store re-aggregates to any key
  * subset.
  */
class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val events = {
    val rnd = new scala.util.Random(11)
    (1 to 5000).map { i =>
      val day = 1 + rnd.nextInt(9)
      (if (i % 3 == 0) "click" else "view",
        ts(f"2024-03-0$day ${rnd.nextInt(24)}%02d:00:00"),
        rnd.nextInt(700).toLong)
    }.toDF("event_type", "ts", "user_id")
  }

  test("merged daily sketches estimate within the bound, reproducibly") {
    def merge() = SketchStore.mergedDistinct(
      SketchStore.dailySketches(events, Seq("event_type"), "ts", "user_id"),
      Seq("event_type"))
      .select("event_type", "approx_distinct")
      .as[(String, Long)].collect().toMap
    val merged = merge()

    // a pure function of the parts: rebuilding reproduces it exactly
    assert(merge() == merged)

    // within the sketch error bound of BOTH the direct single-pass
    // sketch and the exact truth (~2% at lgK=12, 5% margin here)
    val direct = events.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("d"))
      .as[(String, Long)].collect().toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id"))).as[(String, Long)].collect().toMap
    for ((k, est) <- merged) {
      assert(math.abs(est - direct(k)).toDouble / direct(k) < 0.05,
        s"$k: merged=$est direct=${direct(k)}")
      assert(math.abs(est - exact(k)).toDouble / exact(k) < 0.05,
        s"$k: est=$est exact=${exact(k)}")
    }
  }

  test("streaming build: daily sketch parts match the batch build") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val src = MemoryStream[(String, Timestamp, Long)]
    val parts = SketchStore.streamingDailySketches(
      src.toDF().toDF("event_type", "ts", "user_id"),
      Seq("event_type"), "ts", "user_id", watermark = "1 hour")
    val q = parts.writeStream.outputMode("complete")
      .format("memory").queryName("sketch_stream").start()
    try {
      val data = events.as[(String, Timestamp, Long)].collect().toSeq
      data.grouped(2000).foreach { b =>
        src.addData(b: _*); q.processAllAvailable()
      }
      // merged estimates from the streamed parts == from batch parts
      val streamed = SketchStore.mergedDistinct(
        spark.table("sketch_stream"), Seq("event_type"))
        .select("event_type", "approx_distinct", "n_rows")
        .as[(String, Long, Long)].collect()
        .map { case (t, e, n) => t -> ((e, n)) }.toMap
      val batch = SketchStore.mergedDistinct(
        SketchStore.dailySketches(events, Seq("event_type"), "ts", "user_id"),
        Seq("event_type"))
        .select("event_type", "approx_distinct", "n_rows")
        .as[(String, Long, Long)].collect()
        .map { case (t, e, n) => t -> ((e, n)) }.toMap
      assert(streamed.view.mapValues(_._2).toMap == batch.view.mapValues(_._2).toMap) // exact rows
      for ((t, (est, _)) <- streamed)
        assert(math.abs(est - batch(t)._1).toDouble / batch(t)._1 < 0.05,
          s"$t: streamed=$est batch=${batch(t)._1}")
    } finally q.stop()
  }

  test("sketch states survive a parquet store round-trip and re-slice") {
    val dir = java.nio.file.Files.createTempDirectory("sketch-store").toString
    SketchStore.dailySketches(events, Seq("event_type"), "ts", "user_id")
      .write.mode("overwrite").parquet(dir)
    val store = spark.read.parquet(dir)

    // the binary states round-trip bit-for-bit (estimates may shift
    // under a different merge tree, the BYTES may not)
    val preBytes = SketchStore
      .dailySketches(events, Seq("event_type"), "ts", "user_id")
      .select(concat_ws("|", col("event_type"), col("day")),
        md5(col("sketch")))
      .as[(String, String)].collect().toMap
    val postBytes = store
      .select(concat_ws("|", col("event_type"), col("day")),
        md5(col("sketch")))
      .as[(String, String)].collect().toMap
    assert(postBytes == preBytes)

    // re-reading the same store reproduces the same estimates
    def week1() = SketchStore.mergedDistinct(
      spark.read.parquet(dir)
        .filter(col("day") <= lit("2024-03-05").cast("date")),
      Seq("event_type"))
    assert(week1().select("event_type", "approx_distinct")
      .as[(String, Long)].collect().toMap ==
      week1().select("event_type", "approx_distinct")
        .as[(String, Long)].collect().toMap)
    // and the sliced estimate tracks the sliced truth
    val exactW1 = events
      .filter(to_date(col("ts")) <= lit("2024-03-05").cast("date"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")))
      .as[(String, Long)].collect().toMap
    for ((k, est) <- week1().select("event_type", "approx_distinct")
        .as[(String, Long)].collect())
      assert(math.abs(est - exactW1(k)).toDouble / exactW1(k) < 0.05,
        s"$k: est=$est exact=${exactW1(k)}")

    // global re-slice: drop every key, one overall estimate
    val all = SketchStore.mergedDistinct(store, Seq.empty)
    assert(all.select("n_rows").as[Long].head() == 5000L)
    val est = all.select("approx_distinct").as[Long].head()
    assert(math.abs(est - 700L).toDouble / 700.0 < 0.05)
  }

  test("exact parts: merge of daily states EQUALS the one-shot distinct over the union") {
    val merged = SketchStore.mergedDistinctExact(
      SketchStore.dailyExactParts(events, Seq("event_type"), "ts", "user_id"),
      Seq("event_type"))
      .select("event_type", "n_distinct", "n_parts", "n_rows")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val direct = events.groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("d"),
        countDistinct(to_date(col("ts"))).as("p"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(merged == direct)
  }

  test("exact parts survive a parquet store round-trip and re-slice to any key subset") {
    val dirPath = java.nio.file.Files
      .createTempDirectory("graft-exact-store").toString
    SketchStore.dailyExactParts(events, Seq("event_type"), "ts", "user_id")
      .write.mode("overwrite").parquet(dirPath)
    val store = spark.read.parquet(dirPath)
    // re-slice: drop the key entirely — global exact distinct
    val all = SketchStore.mergedDistinctExact(store, Seq())
    assert(all.select("n_rows").as[Long].head() == 5000L)
    val trueDistinct = events.select(countDistinct(col("user_id")))
      .as[Long].head()
    assert(all.select("n_distinct").as[Long].head() == trueDistinct)
  }
}
