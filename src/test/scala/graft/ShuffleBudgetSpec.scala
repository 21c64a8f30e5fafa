package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{BasketOps, CandleOps, EventOps}

/** Shuffle budgets for the round-5 operators, pinned at the physical
  * plan: the indicator family must ride ONE per-key exchange end to
  * end (stacked windows reuse the sort), the basket pair pipeline
  * exactly two (gather + pair count) with a TakeOrderedAndProject
  * top-N (never a global sort), and the feature-store query two (raw →
  * day grain, day grain → per-user windows). A regression that slips
  * an extra exchange into these shapes multiplies 100 TB of traffic —
  * this is the test that catches it before the cluster does.
  */
class ShuffleBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).size

  private lazy val candles = (0 until 48).map { h =>
    ("S", new Timestamp(ts("2024-03-01 00:00:00").getTime + h * 3600000L),
      10.0 + h % 7, 12.0 + h % 5, 8.0 + h % 3, 11.0 + h % 4, 5.0 + h)
  }.toDF("sym", "bucket_ts", "open", "high", "low", "close", "volume")

  test("every indicator runs on one per-key exchange") {
    val plans = Seq(
      "stochastic" -> CandleOps.stochastic(candles, Seq("sym"), "bucket_ts", 14, 3),
      "atr" -> CandleOps.atr(candles, Seq("sym"), "bucket_ts", 14),
      "donchian" -> CandleOps.donchian(candles, Seq("sym"), "bucket_ts", 20),
      "obv" -> CandleOps.obv(candles, Seq("sym"), "bucket_ts", "close", "volume"),
      "macd" -> CandleOps.macd(candles, Seq("sym"), "bucket_ts", "close", 6, 13, 5),
      "pivotPoints" -> CandleOps.pivotPoints(candles, Seq("sym"), "bucket_ts"),
      "ichimoku" -> CandleOps.ichimoku(candles, Seq("sym"), "bucket_ts",
        pTenkan = 3, pKijun = 5, pSenkouB = 9, displacement = 5)
    )
    plans.foreach { case (name, df) =>
      val n = exchanges(df.queryExecution.executedPlan.toString)
      assert(n == 1, s"$name: expected 1 exchange, got $n")
    }
  }

  test("round-6 microstructure indicators ride one per-key exchange") {
    import graft.operators.MicrostructureOps
    val tradeBars = candles.withColumn("trades", lit(3L))
    val plans = Seq(
      "williamsR" -> MicrostructureOps.williamsR(tradeBars, Seq("sym"), "bucket_ts", 14),
      "aroon" -> MicrostructureOps.aroon(tradeBars, Seq("sym"), "bucket_ts", 14),
      "mfi" -> MicrostructureOps.mfi(tradeBars, Seq("sym"), "bucket_ts", 14),
      "cci" -> MicrostructureOps.cci(tradeBars, Seq("sym"), "bucket_ts", 20),
      "amihud" -> MicrostructureOps.amihud(tradeBars, Seq("sym"), "bucket_ts")
    )
    plans.foreach { case (name, df) =>
      val n = exchanges(df.queryExecution.executedPlan.toString)
      // the keyed aggregates (amihud) may add ONE aggregation exchange
      // on top of the window's — never more
      assert(n <= 2, s"$name: expected <=2 exchanges, got $n")
      if (Seq("williamsR", "aroon", "mfi", "cci").contains(name))
        assert(n == 1, s"$name: expected 1 exchange, got $n")
    }
  }

  test("leadLagCorr broadcasts the lag-exploded benchmark; the rollup never reshuffles for the join") {
    import graft.operators.MicrostructureOps
    val twoKeys = candles.unionByName(candles.withColumn("sym", lit("T")))
      .withColumn("trades", lit(3L))
    val plan = MicrostructureOps.leadLagCorr(
      twoKeys, "sym", "bucket_ts", col("sym") === "S", maxLag = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$plan")
    // one window exchange + one (key, lag) aggregation exchange
    assert(exchanges(plan) <= 3, s"too many exchanges:\n$plan")
  }

  test("asofNearest: both directions ride ONE union exchange (two sorts, no second shuffle)") {
    import graft.operators.AsOfJoin
    val l = (0 until 50).map(i =>
      ("S", new Timestamp(ts("2024-03-01 00:00:00").getTime + i * 60000L), i.toLong, i * 1.0))
      .toDF("sym", "ts", "trade_id", "px")
    val r = (0 until 30).map(i =>
      ("S", new Timestamp(ts("2024-03-01 00:00:30").getTime + i * 90000L), 10.0 + i))
      .toDF("sym", "ts", "bid")
    val plan = AsOfJoin.asofNearest(l, r, Seq("sym"), "ts",
      Seq("trade_id", "px"), Seq("bid"))
      .queryExecution.executedPlan.toString
    assert(exchanges(plan) == 1, s"expected 1 exchange:\n$plan")
    assert("Sort ".r.findAllIn(plan).size >= 2, "both sort orders expected")
  }

  test("basket pairs: two exchanges and a per-partition top-N") {
    val facts = (1 to 300).map(i => (i.toLong / 3, (i % 17).toLong))
      .toDF("basket", "item")
    val plan = BasketOps.coOccurrence(facts, "basket", "item", topN = 10)
      .queryExecution.executedPlan.toString
    assert(exchanges(plan) == 2, s"expected 2 exchanges:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator:\n$plan")
    assert(!plan.contains("Sort "), "global sort snuck in") // top-N only
  }

  test("round-5 operators are bit-identical under repartitioning") {
    // the reproducibility contract behind every oracle hash-match:
    // exact-integer accumulation makes results independent of
    // partitioning, so a cluster and a laptop agree bitwise
    val wild = candles.repartition(7)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(CandleOps.stochastic(candles, Seq("sym"), "bucket_ts", 14, 3)) ==
      rows(CandleOps.stochastic(wild, Seq("sym"), "bucket_ts", 14, 3)))
    assert(rows(CandleOps.macd(candles, Seq("sym"), "bucket_ts", "close", 6, 13, 5)) ==
      rows(CandleOps.macd(wild, Seq("sym"), "bucket_ts", "close", 6, 13, 5)))
    assert(rows(CandleOps.obv(candles, Seq("sym"), "bucket_ts", "close", "volume")) ==
      rows(CandleOps.obv(wild, Seq("sym"), "bucket_ts", "close", "volume")))
    assert(rows(CandleOps.volumeProfile(candles, Seq("sym"), "close", "volume", 100L)) ==
      rows(CandleOps.volumeProfile(wild, Seq("sym"), "close", "volume", 100L)))
    val ev = (1 to 300).map { i =>
      (i.toLong % 7, if (i % 5 == 0) "purchase" else "view",
        new Timestamp(ts("2024-03-01 00:00:00").getTime + i * 7200000L),
        (i % 13) + 0.25)
    }.toDF("user_id", "event_type", "ts", "value")
    val evWild = ev.repartition(11)
    import org.apache.spark.sql.functions.col
    val pred = col("event_type") === "purchase"
    assert(rows(EventOps.rollingUserFeatures(ev, "user_id", "ts", "value", pred)) ==
      rows(EventOps.rollingUserFeatures(evWild, "user_id", "ts", "value", pred)))
    assert(rows(EventOps.rfm(ev, "user_id", "ts", "value", pred)) ==
      rows(EventOps.rfm(evWild, "user_id", "ts", "value", pred)))
    assert(rows(EventOps.cohortLtv(ev, "user_id", "ts", "value", pred)) ==
      rows(EventOps.cohortLtv(evWild, "user_id", "ts", "value", pred)))
  }

  test("round-6 microstructure/graph operators are bit-identical under repartitioning") {
    import graft.operators.{GraphOps, MicrostructureOps}
    val bars = candles.withColumn("trades", lit(3L))
    val wild = bars.repartition(9)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(MicrostructureOps.aroon(bars, Seq("sym"), "bucket_ts", 14)) ==
      rows(MicrostructureOps.aroon(wild, Seq("sym"), "bucket_ts", 14)))
    assert(rows(MicrostructureOps.cci(bars, Seq("sym"), "bucket_ts", 20)) ==
      rows(MicrostructureOps.cci(wild, Seq("sym"), "bucket_ts", 20)))
    assert(rows(MicrostructureOps.mfi(bars, Seq("sym"), "bucket_ts", 14)) ==
      rows(MicrostructureOps.mfi(wild, Seq("sym"), "bucket_ts", 14)))
    assert(rows(MicrostructureOps.varianceRatio(bars, Seq("sym"), "bucket_ts", 4)) ==
      rows(MicrostructureOps.varianceRatio(wild, Seq("sym"), "bucket_ts", 4)))
    assert(rows(MicrostructureOps.olsSeasonalTrend(
      bars, Seq("sym"), "bucket_ts", "2024-03-01 00:00:00")) ==
      rows(MicrostructureOps.olsSeasonalTrend(
        wild, Seq("sym"), "bucket_ts", "2024-03-01 00:00:00")))
    val edges = (1 to 60).map(i => ((i % 9).toLong, 9L + i % 13)).distinct
      .filter(e => e._1 != e._2).toDF("x", "y")
    val eWild = edges.repartition(5)
    assert(rows(GraphOps.labelPropagationPinned(edges, 3)) ==
      rows(GraphOps.labelPropagationPinned(eWild, 3)))
    assert(rows(GraphOps.edgeOverlap(edges)) == rows(GraphOps.edgeOverlap(eWild)))
    assert(rows(GraphOps.kCorePinned(edges, 2, 4)) ==
      rows(GraphOps.kCorePinned(eWild, 2, 4)))
  }

  test("multi-grain gap scan: two exchanges and ONE window for all 8 grains") {
    // round-6 single-pass rewrite: distinct finest buckets (exchange 1),
    // one lag-window per key (exchange 2), then explode+filter per grain
    // — never a distinct or window per grain. 8 grains previously cost
    // 16 exchanges; a regression back to per-grain windows multiplies
    // the shuffled volume by the grain count at 100 TB.
    val ev = (0 until 400).filter(i => i % 97 != 0).map { i =>
      ((i % 3).toLong, new Timestamp(ts("2024-03-01 00:00:00").getTime + i * 60000L))
    }.toDF("user_id", "ts")
    val scan = operators.GapOps.multiGrainGapScan(
      ev, Seq("user_id"), "ts", graft.model.Timeframe.RollupGrains)
    val plan = scan.queryExecution.executedPlan.toString
    assert(exchanges(plan) == 2, s"expected 2 exchanges:\n$plan")
    assert("Window ".r.findAllIn(plan).size == 1, s"expected 1 window:\n$plan")
  }

  test("feature-store query: raw shuffles once, day grain once") {
    val events = (1 to 200).map { i =>
      (i.toLong % 9, "view",
        new Timestamp(ts("2024-03-01 00:00:00").getTime + i * 3600000L), 1.0)
    }.toDF("user_id", "event_type", "ts", "value")
    val plan = EventOps.rollingUserFeatures(events, "user_id", "ts", "value",
      col("event_type") === "purchase")
      .queryExecution.executedPlan.toString
    // exchange 1: raw events -> (user, day) aggregate;
    // exchange 2: day-grain rows -> per-user windows (orders of
    // magnitude fewer rows than the raw stream)
    assert(exchanges(plan) == 2, s"expected 2 exchanges:\n$plan")
  }

  test("round-7 smoothers ride ONE per-key exchange; cuped stays at its three aggregates") {
    val plans = Seq(
      "holtBrown" -> CandleOps.holtBrown(candles, Seq("sym"), "bucket_ts", "close", 4),
      "ewmaVolatility" -> CandleOps.ewmaVolatility(candles, Seq("sym"), "bucket_ts", "close", 4),
      "keltner" -> CandleOps.keltner(candles, Seq("sym"), "bucket_ts", emaN = 4, atrN = 3))
    plans.foreach { case (name, df) =>
      val n = exchanges(df.queryExecution.executedPlan.toString)
      assert(n == 1, s"$name: expected 1 exchange, got $n")
    }
    val ev = (1 to 60).map { i =>
      (i.toLong % 9, if (i % 3 == 0) "purchase" else "view", i * 1.0)
    }.toDF("user_id", "event_type", "value")
    val cuped = EventOps.cupedReadout(ev, "user_id", "event_type", "value",
      "view", "purchase", Seq("a" -> 0.5, "b" -> 0.5))
    val n = exchanges(cuped.queryExecution.executedPlan.toString)
    // per-user aggregate, per-arm aggregate, global-moment aggregate —
    // the 1-row global side broadcasts, never re-exchanges the users
    assert(n <= 4, s"cuped: expected <=4 exchanges, got $n")
  }

  test("incremental edge fold: delta aggregates, standing joins without re-deriving") {
    val standing = Seq((1L, 2L, 3L), (2L, 5L, 1L)).toDF("x", "y", "support")
    val facts = (1 to 30).map(i => ((i % 6).toLong, (i % 7).toLong))
      .toDF("order_id", "part_id")
    val plan = operators.GraphOps
      .foldItemEdgeSupports(standing, facts, "order_id", "part_id")
      .queryExecution.executedPlan.toString
    // basket gather + pair count on the delta, then the full-outer
    // merge — bounded; a regression that re-derives the standing side
    // would add its own gather/count pair
    assert(exchanges(plan) <= 4, s"fold: expected <=4 exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("exact sketch store: build one exchange, merge one exchange (both map-side combinable)") {
    val ev = (1 to 300).map { i =>
      (if (i % 3 == 0) "click" else "view",
        new Timestamp(ts("2024-03-01 00:00:00").getTime + i * 3600000L),
        (i % 40).toLong)
    }.toDF("event_type", "ts", "user_id")
    val parts = operators.SketchStore.dailyExactParts(
      ev, Seq("event_type"), "ts", "user_id")
    val pPlan = parts.queryExecution.executedPlan.toString
    assert(exchanges(pPlan) == 1, s"parts: expected 1 exchange:\n$pPlan")
    // merge re-keys from (key, day, value) parts to (key): countDistinct
    // expands to a two-level aggregate — at most 2 exchanges (distinct
    // gather + final), never per-row traffic beyond the part table
    val merged = operators.SketchStore.mergedDistinctExact(parts, Seq("event_type"))
    val mPlan = merged.queryExecution.executedPlan.toString
    val n = exchanges(mPlan)
    assert(n >= 1 && n <= 3, s"merge: expected 1-3 exchanges, got $n:\n$mPlan")
  }
}
