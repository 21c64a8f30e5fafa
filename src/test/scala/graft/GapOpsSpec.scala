package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.GapOps

/** Gap machinery invariants (SURVEY.md §5): inject gaps → G2 finds
  * exactly them; islands round-trip; planner covers [start, earliest).
  */
class GapOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** One row per minute 08:00-08:59 for symbol A, minus punched-out
    * holes.
    */
  private def seriesWithHoles(holes: Set[Int]): Seq[(String, Timestamp)] =
    (0 until 60).filterNot(holes).map(m => ("A", ts(f"2024-03-01 08:$m%02d:00")))

  test("G2 missingBuckets finds exactly the injected holes") {
    val holes = Set(7, 8, 9, 31, 55)
    val df = seriesWithHoles(holes).toDF("symbol", "t")
    val missing = GapOps.missingBuckets(df, Seq("symbol"), "t", "1 minute")
      .select("bucket_ts").as[Timestamp].collect().toSet
    assert(missing == holes.map(m => ts(f"2024-03-01 08:$m%02d:00")))
  }

  test("G2 on a gapless series is empty") {
    val df = seriesWithHoles(Set.empty).toDF("symbol", "t")
    assert(GapOps.missingBuckets(df, Seq("symbol"), "t", "1 minute").count() == 0)
  }

  test("G3 islandRanges round-trips the observed runs") {
    // observed runs: [0..6], [10..30], [32..54], [56..59]
    val holes = Set(7, 8, 9, 31, 55)
    val df = seriesWithHoles(holes).toDF("symbol", "t")
    val islands = GapOps.islandRanges(df, Seq("symbol"), "t", "1 minute", 60L)
      .orderBy("range_start")
      .select("range_start", "range_end", "n_buckets")
      .as[(Timestamp, Timestamp, Long)].collect()
    assert(islands.toSeq == Seq(
      (ts("2024-03-01 08:00:00"), ts("2024-03-01 08:06:00"), 7L),
      (ts("2024-03-01 08:10:00"), ts("2024-03-01 08:30:00"), 21L),
      (ts("2024-03-01 08:32:00"), ts("2024-03-01 08:54:00"), 23L),
      (ts("2024-03-01 08:56:00"), ts("2024-03-01 08:59:00"), 4L)))
  }

  test("G4 freshnessLag flags exactly the stale keys") {
    val df = Seq(
      ("fresh", ts("2024-03-01 08:59:30")),
      ("stale", ts("2024-03-01 08:50:00"))).toDF("symbol", "t")
    val out = GapOps.freshnessLag(df, Seq("symbol"), "t",
        lit("2024-03-01 09:00:00").cast("timestamp"), 120000000L)
      .select("symbol", "is_stale").as[(String, Boolean)].collect().toMap
    assert(out == Map("fresh" -> false, "stale" -> true))
  }

  test("P4 backfillChunks tiles [startDate, earliest) exactly") {
    val df = Seq(("A", ts("2024-03-01 07:25:00"))).toDF("symbol", "t")
    val chunks = GapOps.backfillChunks(df, Seq("symbol"), "t",
        lit("2024-03-01 04:00:00").cast("timestamp"), "1 hour", "90 minutes")
      .orderBy("chunk_start")
      .select("chunk_start", "chunk_end").as[(Timestamp, Timestamp)].collect()
    // earliest floored to hour = 07:00; chunks of 90m from 04:00
    assert(chunks.toSeq == Seq(
      (ts("2024-03-01 04:00:00"), ts("2024-03-01 05:30:00")),
      (ts("2024-03-01 05:30:00"), ts("2024-03-01 07:00:00"))))
    // fully covered symbol emits no chunks
    val covered = Seq(("B", ts("2024-03-01 03:59:00"))).toDF("symbol", "t")
    assert(GapOps.backfillChunks(covered, Seq("symbol"), "t",
      lit("2024-03-01 04:00:00").cast("timestamp"), "1 hour", "90 minutes").count() == 0)
  }

  test("P5 listingDiff labels adds and removes") {
    val cur = Seq("A", "B", "C").toDF("symbol")
    val known = Seq("B", "C", "D").toDF("symbol")
    val out = GapOps.listingDiff(cur, known, Seq("symbol"))
      .as[(String, String)].collect().toSet
    assert(out == Set(("A", "added"), ("D", "removed")))
  }

  test("R4/R5 multiGrainGapScan finds the holes at every grain, consistent with a materialized rollup store") {
    import graft.model.Timeframe
    // minutes 08:00-09:59 with a 12-minute hole [08:30, 08:41]
    val rows = ((0 until 30) ++ (42 until 120))
      .map(m => ("A", ts(f"2024-03-01 ${8 + m / 60}%02d:${m % 60}%02d:00"), 1.0))
      .toDF("symbol", "t", "v")
    val grains = Seq(Timeframe.parse("1m"), Timeframe.parse("5m"), Timeframe.parse("15m"))
    val scan = GapOps.multiGrainGapScan(rows, Seq("symbol"), "t", grains)
      .select("grain", "range_start", "range_end", "n_missing")
      .as[(String, Timestamp, Timestamp, Long)].collect().toSet
    // 1m: missing run [08:30, 08:41], 12 buckets
    // 5m: buckets 08:30/08:35 fully inside the hole -> [08:30, 08:35], 2
    // 15m: every 15m bucket has at least one event -> no gaps
    assert(scan == Set(
      ("1m", ts("2024-03-01 08:30:00"), ts("2024-03-01 08:41:00"), 12L),
      ("5m", ts("2024-03-01 08:30:00"), ts("2024-03-01 08:35:00"), 2L)))

    // the scan over raw events must agree with scanning each grain's
    // materialized rollup (one row per (key, bucket) with data) —
    // the shape the reference's quality loop actually reads
    for (g <- grains) {
      val rollup = graft.operators.CandleOps.ohlcvRollup(
        rows, Seq("symbol"), "t", "v", g.sparkInterval)
      val fromStore = GapOps.multiGrainGapScan(
        rollup, Seq("symbol"), "bucket_ts", Seq(g))
        .select("grain", "range_start", "range_end", "n_missing")
        .as[(String, Timestamp, Timestamp, Long)].collect().toSet
      assert(fromStore == scan.filter(_._1 == g.label))
    }
  }

  test("G6 expectedBucketCount arithmetic") {
    val df = Seq(1).toDF("x").select(
      GapOps.expectedBucketCount(
        lit("2024-03-01 08:00:00").cast("timestamp"),
        lit("2024-03-01 09:00:00").cast("timestamp"), 900L).as("n"))
    assert(df.as[Long].head() == 4L)
  }
}
