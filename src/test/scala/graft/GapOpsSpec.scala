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

  test("G6 expectedBucketCount arithmetic") {
    val df = Seq(1).toDF("x").select(
      GapOps.expectedBucketCount(
        lit("2024-03-01 08:00:00").cast("timestamp"),
        lit("2024-03-01 09:00:00").cast("timestamp"), 900L).as("n"))
    assert(df.as[Long].head() == 4L)
  }
}
