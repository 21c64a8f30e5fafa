package graft

import java.sql.Timestamp

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("banded range join finds exactly the within-tolerance pairs") {
    val l = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 10:00:00"), 102L)
    ).toDF("k", "t", "lid")
    val r = Seq(
      (1L, ts("2024-01-01 10:00:30"), 200L), // 30s from 100 -> match
      (1L, ts("2024-01-01 10:00:59"), 201L), // 59s from 100 -> match
      (1L, ts("2024-01-01 10:01:30"), 202L), // 90s from 100 -> no
      (1L, ts("2024-01-01 11:59:10"), 203L), // 50s from 101 -> match
      (2L, ts("2024-01-01 10:00:20"), 204L), // same key 2 -> match
      (3L, ts("2024-01-01 10:00:00"), 205L)  // different key -> no
    ).toDF("k", "t", "rid")
    val out = RangeJoin.timeProximityJoin(l, r, Seq("k"), "t", 60L,
        Seq("lid"), Seq("rid"))
      .select("l_lid", "r_rid").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 200L), (100L, 201L), (101L, 203L), (102L, 204L)))
  }

  test("band-boundary pairs are caught (adjacent-band duplication)") {
    // two timestamps 1s apart but in different tolerance bands
    val l = Seq((1L, ts("2024-01-01 10:00:59"), 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, ts("2024-01-01 10:01:00"), 2L)).toDF("k", "t", "rid")
    val out = RangeJoin.timeProximityJoin(l, r, Seq("k"), "t", 60L, Seq("lid"), Seq("rid"))
    assert(out.count() == 1)
  }

  test("no duplicate pairs emitted") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, ts("2024-01-01 10:00:01"), 2L)).toDF("k", "t", "rid")
    val out = RangeJoin.timeProximityJoin(l, r, Seq("k"), "t", 60L, Seq("lid"), Seq("rid"))
    assert(out.count() == 1)
  }

  test("interval overlap join: half-open semantics, report-once, degenerates dropped") {
    import graft.operators.IntervalJoin
    val l = Seq(
      // spans many buckets; overlaps rid 200 and 201, not 202 (touching)
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 14:00:00"), 100L),
      // nested fully inside rid 201's window
      (1L, ts("2024-01-01 12:10:00"), ts("2024-01-01 12:20:00"), 101L),
      // degenerate (end == start): dropped
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), 102L),
      // other key: no partner
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 103L)
    ).toDF("k", "start", "end", "lid")
    val r = Seq(
      (1L, ts("2024-01-01 09:30:00"), ts("2024-01-01 10:30:00"), 200L),
      (1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00"), 201L),
      (1L, ts("2024-01-01 14:00:00"), ts("2024-01-01 15:00:00"), 202L) // touches 100, half-open -> no
    ).toDF("k", "start", "end", "rid")
    val out = IntervalJoin.overlapJoin(l, r, Seq("k"), "start", "end", 3600L,
        Seq("lid"), Seq("rid"))
      .select("l_lid", "r_rid", "overlap_us")
      .as[(Long, Long, Long)].collect()
    // exactly once per overlapping pair, despite multi-bucket overlaps
    assert(out.map(p => (p._1, p._2)).toSet ==
      Set((100L, 200L), (100L, 201L), (101L, 201L)))
    assert(out.length == 3)
    val o = out.map(p => (p._1, p._2) -> p._3).toMap
    assert(o((100L, 200L)) == 30L * 60 * 1000000) // 10:00-10:30
    assert(o((100L, 201L)) == 60L * 60 * 1000000) // 12:00-13:00
    assert(o((101L, 201L)) == 10L * 60 * 1000000) // 12:10-12:20
  }
}
