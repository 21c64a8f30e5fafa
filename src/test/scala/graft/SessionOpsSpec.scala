package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.SessionOps

/** Inactivity-gap sessionization: boundary semantics (a gap exactly
  * equal to the threshold MERGES — session_window's close is inclusive,
  * `ts <= prev + gap`) and equivalence of the two formulations (native
  * session_window vs lag+running-count).
  */
class SessionOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val events = Seq(
    // user 1: exactly-30min gap MERGES (inclusive close), 30:01 splits
    (1L, ts("2024-03-01 08:00:00"), 1.0),
    (1L, ts("2024-03-01 08:30:00"), 2.0),  // 30:00 → same session
    (1L, ts("2024-03-01 09:00:01"), 4.0),  // 30:01 → NEW session
    // user 2: one session, gap just under the threshold
    (2L, ts("2024-03-01 09:00:00"), 8.0),
    (2L, ts("2024-03-01 09:29:59"), 16.0), // 29:59 → same session
    // user 3: single event
    (3L, ts("2024-03-01 10:00:00"), 32.0)
  ).toDF("user_id", "ts", "value")

  test("sessionSummaries: > gap starts a new session, <= gap merges") {
    val got = SessionOps
      .sessionSummaries(events, Seq("user_id"), "ts", "value", "30 minutes")
      .as[(Long, Timestamp, Timestamp, Long, Double)]
      .collect().sortBy(r => (r._1, r._2.getTime))
    assert(got.map(r => (r._1, r._4, r._5)).toSeq == Seq(
      (1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 2L, 24.0), (3L, 1L, 32.0)))
    assert(got(1)._2 == ts("2024-03-01 09:00:01")) // new session starts after the gap
  }

  test("assignSessions agrees with sessionSummaries on a randomized stream") {
    val rnd = new scala.util.Random(7)
    var t = 0L
    val stream = (0 until 500).map { i =>
      t += (if (rnd.nextInt(10) == 0) 1800 + rnd.nextInt(3600) else rnd.nextInt(900))
      (rnd.nextInt(5).toLong, new Timestamp(1709280000000L + t * 1000), (i % 97) + 0.25)
    }.toDF("user_id", "ts", "value")

    val fromAssign = SessionOps
      .assignSessions(stream, Seq("user_id"), "ts", gapSeconds = 1800L)
      .groupBy($"user_id", $"session_n")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"),
        graft.operators.CandleOps.moneySum($"value").as("total_value"))
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
    val fromWindow = SessionOps
      .sessionSummaries(stream, Seq("user_id"), "ts", "value", "30 minutes")
    assert(fromAssign.exceptAll(fromWindow).isEmpty &&
      fromWindow.exceptAll(fromAssign).isEmpty)
  }

  test("bounceRate counts single-event sessions per key") {
    val sessions = Seq(
      ("u1", 1L), ("u1", 3L), ("u2", 1L)
    ).toDF("user_id", "n_events")
    val got = SessionOps.bounceRate(sessions, Seq("user_id"))
      .select("user_id", "n_sessions", "n_bounces", "bounce_rate")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("u1", 2L, 1L, 0.5), ("u2", 1L, 1L, 1.0)))
  }

  test("depthHistogram counts sessions per depth with global shares") {
    val sessions = Seq(
      ("u1", 1L), ("u2", 1L), ("u1", 3L)
    ).toDF("user_id", "n_events")
    val got = SessionOps.depthHistogram(sessions)
      .select("depth", "n_sessions", "share")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 2.0 / 3.0), (3L, 1L, 1.0 / 3.0)))
  }
}
