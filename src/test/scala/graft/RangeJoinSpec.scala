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
}
