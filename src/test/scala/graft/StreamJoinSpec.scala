package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.streaming.StreamJoin

case class Evt(k: Long, t: Timestamp, id: Long)

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val lefts = Seq(
    Evt(1L, ts("2024-01-01 10:00:00"), 100L),
    Evt(1L, ts("2024-01-01 12:00:00"), 101L),
    Evt(2L, ts("2024-01-01 10:00:00"), 102L))
  private lazy val rights = Seq(
    Evt(1L, ts("2024-01-01 10:00:30"), 200L),
    Evt(1L, ts("2024-01-01 10:01:30"), 201L), // outside 60s
    Evt(1L, ts("2024-01-01 11:59:40"), 202L),
    Evt(2L, ts("2024-01-01 09:59:50"), 203L), // right before left: inside
    Evt(3L, ts("2024-01-01 10:00:00"), 204L)) // wrong key

  test("stream-stream interval join equals the batch banded range join") {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[Evt]
    val rs = MemoryStream[Evt]
    val joined = StreamJoin.intervalJoin(
      ls.toDF(), rs.toDF(), Seq("k"), "t", 60L, "10 minutes",
      leftPayload = Seq("id"), rightPayload = Seq("id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("sj_out").start()
    try {
      ls.addData(lefts)
      rs.addData(rights)
      q.processAllAvailable()
      val got = spark.table("sj_out")
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      val want = RangeJoin.timeProximityJoin(
          lefts.toDF(), rights.toDF(), Seq("k"), "t", 60L, Seq("id"), Seq("id"))
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      assert(got == want)
      assert(got == Set((100L, 200L), (101L, 202L), (102L, 203L)))
    } finally q.stop()
  }
}
