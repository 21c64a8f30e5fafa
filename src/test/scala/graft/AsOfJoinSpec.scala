package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    ("A", ts("2024-03-01 08:00:05"), 1L, 100.0), // after quote@08:00:00
    ("A", ts("2024-03-01 08:00:10"), 2L, 101.0), // exactly at quote ts (inclusive)
    ("A", ts("2024-03-01 07:59:00"), 3L, 99.0),  // before any quote -> null
    ("B", ts("2024-03-01 08:00:05"), 4L, 50.0)   // other key
  ).toDF("sym", "ts", "trade_id", "px")

  private lazy val quotes = Seq(
    ("A", ts("2024-03-01 08:00:00"), 10.0),
    ("A", ts("2024-03-01 08:00:10"), 11.0),
    ("A", ts("2024-03-01 08:01:00"), 12.0), // later than all trades
    ("B", ts("2024-03-01 08:00:01"), 20.0)
  ).toDF("sym", "ts", "bid")

  test("backward as-of: latest quote at-or-before each trade, per key") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "ts",
        leftPayload = Seq("trade_id", "px"), rightPayload = Seq("bid"))
      .select("trade_id", "asof_ts", "asof_bid")
      .as[(Long, Option[Timestamp], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(ts("2024-03-01 08:00:00")), Some(10.0))))
    assert(out(2L) == ((Some(ts("2024-03-01 08:00:10")), Some(11.0)))) // tie inclusive
    assert(out(3L) == ((None, None)))                                   // nothing precedes
    assert(out(4L) == ((Some(ts("2024-03-01 08:00:01")), Some(20.0)))) // keyed
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "ts",
        leftPayload = Seq("trade_id", "px"), rightPayload = Seq("bid"),
        toleranceUs = Some(4000000L)) // 4s
      .select("trade_id", "asof_bid")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty)          // 5s-old quote > 4s tolerance
    assert(out(2L).contains(11.0))   // 0s old
    assert(out(4L).contains(20.0))   // 4s old, within
  }

  test("forward as-of: earliest quote at-or-after each trade, per key") {
    val out = AsOfJoin.asofForward(trades, quotes, Seq("sym"), "ts",
        leftPayload = Seq("trade_id", "px"), rightPayload = Seq("bid"))
      .select("trade_id", "asof_ts", "asof_bid")
      .as[(Long, Option[Timestamp], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(ts("2024-03-01 08:00:10")), Some(11.0))))
    assert(out(2L) == ((Some(ts("2024-03-01 08:00:10")), Some(11.0)))) // tie inclusive
    assert(out(3L) == ((Some(ts("2024-03-01 08:00:00")), Some(10.0)))) // next ahead
    assert(out(4L) == ((None, None))) // B's only quote precedes the trade
  }

  test("forward tolerance bounds how far ahead the match may be") {
    val out = AsOfJoin.asofForward(trades, quotes, Seq("sym"), "ts",
        leftPayload = Seq("trade_id", "px"), rightPayload = Seq("bid"),
        toleranceUs = Some(4000000L)) // 4s
      .select("trade_id", "asof_bid")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty)          // next quote is 5s ahead
    assert(out(2L).contains(11.0))   // 0s ahead
    assert(out(3L).isEmpty)          // 60s ahead
  }

  test("nearest as-of: closer side wins, exact ties go backward") {
    val out = AsOfJoin.asofNearest(trades, quotes, Seq("sym"), "ts",
        leftPayload = Seq("trade_id", "px"), rightPayload = Seq("bid"))
      .select("trade_id", "asof_ts", "asof_bid")
      .as[(Long, Option[Timestamp], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // trade 1 at 08:00:05: back quote 5s behind, fwd 5s ahead -> tie -> backward
    assert(out(1L) == ((Some(ts("2024-03-01 08:00:00")), Some(10.0))))
    assert(out(2L) == ((Some(ts("2024-03-01 08:00:10")), Some(11.0)))) // exact hit
    // trade 3 has no backward match; the forward one fills in
    assert(out(3L) == ((Some(ts("2024-03-01 08:00:00")), Some(10.0))))
    assert(out(4L) == ((Some(ts("2024-03-01 08:00:01")), Some(20.0))))
  }

  test("property: all three directions equal brute force on 8 random fixtures") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed * 31 + 7)
      def stamp() =
        ts(f"2024-03-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")
      val lRows = (1 to 40).map(i =>
        (s"k${rnd.nextInt(3)}", stamp(), i.toLong, i * 1.0))
      // rights unique per (key, ts): with duplicates the matched
      // payload would be engine-chosen, not semantics-defined
      val rRows = (1 to 25).map(i => (s"k${rnd.nextInt(3)}", stamp(), 1000.0 + i))
        .groupBy(q => (q._1, q._2)).map(_._2.head).toSeq
      val l = lRows.toDF("sym", "ts", "trade_id", "px")
      val r = rRows.toDF("sym", "ts", "bid")
      val tol = if (seed % 2 == 0) Some(1800L * 1000000L) else None
      def brute(dir: String): Map[Long, Option[Double]] =
        lRows.map { case (k, t, id, _) =>
          val cand = rRows.filter(_._1 == k)
          def within(q: (String, Timestamp, Double)) = tol.forall(tu =>
            math.abs(q._2.getTime - t.getTime) * 1000L <= tu)
          val back = cand.filter(q => !q._2.after(t)).filter(within)
            .sortBy(_._2.getTime).lastOption
          val fwd = cand.filter(q => !q._2.before(t)).filter(within)
            .sortBy(_._2.getTime).headOption
          val pick = dir match {
            case "back" => back
            case "fwd" => fwd
            case "near" => (back, fwd) match {
              case (Some(b), Some(f)) =>
                if (t.getTime - b._2.getTime <= f._2.getTime - t.getTime) Some(b)
                else Some(f)
              case (b, f) => b.orElse(f)
            }
          }
          id -> pick.map(_._3)
        }.toMap
      def got(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
        df.select("trade_id", "asof_bid")
          .as[(Long, Option[Double])].collect().toMap
      assert(got(AsOfJoin.asof(l, r, Seq("sym"), "ts",
        Seq("trade_id", "px"), Seq("bid"), toleranceUs = tol)) == brute("back"),
        s"seed=$seed back")
      assert(got(AsOfJoin.asofForward(l, r, Seq("sym"), "ts",
        Seq("trade_id", "px"), Seq("bid"), toleranceUs = tol)) == brute("fwd"),
        s"seed=$seed fwd")
      assert(got(AsOfJoin.asofNearest(l, r, Seq("sym"), "ts",
        Seq("trade_id", "px"), Seq("bid"), toleranceUs = tol)) == brute("near"),
        s"seed=$seed near")
    }
  }

  test("nearest tolerance drops both sides independently") {
    val out = AsOfJoin.asofNearest(trades, quotes, Seq("sym"), "ts",
        leftPayload = Seq("trade_id", "px"), rightPayload = Seq("bid"),
        toleranceUs = Some(4000000L)) // 4s
      .select("trade_id", "asof_bid")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty)          // both candidates 5s away
    assert(out(2L).contains(11.0))
    assert(out(3L).isEmpty)          // forward candidate 60s away
    assert(out(4L).contains(20.0))   // backward 4s, inside
  }
}
