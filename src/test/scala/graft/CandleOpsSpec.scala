package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Candle
import graft.operators.{CandleOps, IngestOps}

/** Invariant tests ported from the reference's runtime checks
  * (SURVEY.md §5): dedup keeps the latest writer, the rollup cascade
  * commutes with direct aggregation, CHECK constraints reject malformed
  * candles.
  */
class CandleOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def candle(
      symbol: String, start: String, o: Double, h: Double, l: Double,
      c: Double, v: Double, trades: Int = 1, receipt: String = null
  ): Candle = {
    val st = ts(start)
    val stop = new Timestamp(st.getTime + 60000)
    Candle("BINANCE", symbol, "1m", st, stop, stop.getTime / 1000, trades,
      o, h, l, c, v, stop, if (receipt == null) stop else ts(receipt))
  }

  // A clean contiguous 1m series: 08:00..08:59 for two symbols.
  private lazy val series: Seq[Candle] = for {
    sym <- Seq("BTC-USDT", "ETH-USDT")
    m <- 0 until 60
  } yield {
    val base = if (sym == "BTC-USDT") 100.0 else 10.0
    candle(sym, f"2024-03-01 08:$m%02d:00", base + m, base + m + 2,
      base + m - 1, base + m + 1, 5.0, trades = 2)
  }

  test("B2 latestByKey keeps exactly the max-receipt row per key") {
    val dup = candle("BTC-USDT", "2024-03-01 08:05:00", 999, 999, 999, 999,
      999, trades = 9, receipt = "2024-03-01 09:00:00") // later writer wins
    val older = candle("BTC-USDT", "2024-03-01 08:05:00", 111, 111, 111, 111,
      111, trades = 1, receipt = "2024-03-01 07:59:00") // stale retry, loses
    val df = (series ++ Seq(dup, older)).toDF()
    val keys = Seq("exchange", "symbol", "start", "interval")

    val out = CandleOps.latestByKey(df, keys, "receipt_timestamp")
    assert(out.count() == 120) // one row per key survives
    val winner = out.filter($"symbol" === "BTC-USDT" &&
      $"start" === ts("2024-03-01 08:05:00")).as[Candle].head()
    assert(winner.open == 999.0 && winner.trades == 9)

    // agg form agrees with window form on the payload columns
    val out2 = CandleOps.latestByKeyAgg(df, keys, "receipt_timestamp",
      Seq("open", "high", "low", "close", "volume", "trades"))
    val w2 = out2.filter($"symbol" === "BTC-USDT" &&
      $"start" === ts("2024-03-01 08:05:00")).head()
    assert(w2.getAs[Double]("open") == 999.0 && w2.getAs[Int]("trades") == 9)
  }

  test("A5 ohlcvRollup computes argMin/argMax/min/max/sum per bucket") {
    val df = series.toDF()
    val r = CandleOps.ohlcvRollup(df, Seq("symbol"), "start", "close", "15 minutes")
    assert(r.count() == 8) // 2 symbols x 4 buckets
    val b0 = r.filter($"symbol" === "BTC-USDT" &&
      $"bucket_ts" === ts("2024-03-01 08:00:00")).head()
    // close values for minutes 0..14 are 101..115
    assert(b0.getAs[Double]("open") == 101.0)   // argMin by start
    assert(b0.getAs[Double]("close") == 115.0)  // argMax by start
    assert(b0.getAs[Double]("high") == 115.0)
    assert(b0.getAs[Double]("low") == 101.0)
    assert(b0.getAs[Double]("volume") == (101 to 115).sum.toDouble)
    assert(b0.getAs[Long]("trades") == 15L)
  }

  test("A6 cascade(15m -> 1h) equals direct 1h rollup (MV commutativity)") {
    val df = series.toDF()
    val direct2 = CandleOps.ohlcvRollup(df, Seq("symbol"), "start", "close", "1 hour")
    val r15 = CandleOps.ohlcvRollup(df, Seq("symbol"), "start", "close",
      "15 minutes", withCarriers = true)
    val cascaded = CandleOps.finishRollup(
      CandleOps.cascadeRollup(r15, Seq("symbol"), "bucket_ts", "1 hour"),
      Seq("symbol"))
    val cols = Seq("symbol", "bucket_ts", "open", "high", "low", "close", "volume", "trades")
    val a = cascaded.select(cols.map(col): _*).orderBy("symbol", "bucket_ts").collect()
    val b = direct2.select(cols.map(col): _*).orderBy("symbol", "bucket_ts").collect()
    assert(a.sameElements(b))
  }

  test("P3 candleChecks rejects exactly the CHECK-violating rows") {
    val good = candle("BTC-USDT", "2024-03-01 08:00:00", 10, 12, 9, 11, 100)
    val badOrder = candle("BTC-USDT", "2024-03-01 08:01:00", 10, 9, 11, 11, 100) // high<open, low>open
    val badNan = candle("BTC-USDT", "2024-03-01 08:02:00", Double.NaN, 12, 9, 11, 100)
    val badInf = candle("BTC-USDT", "2024-03-01 08:03:00", 10, Double.PositiveInfinity, 9, 11, 100)
    val badKey = candle("", "2024-03-01 08:04:00", 10, 12, 9, 11, 100)
    val df = Seq(good, badOrder, badNan, badInf, badKey).toDF()
    val check = IngestOps.candleChecks(
      $"open", $"high", $"low", $"close", $"volume", $"close_unixtime",
      Seq($"exchange", $"symbol", $"interval"))
    val out = IngestOps.validate(df, check).as[Candle].collect()
    assert(out.length == 1 && out.head.start == ts("2024-03-01 08:00:00"))
  }

  test("B1 recentTopK returns the top-n in total order") {
    val df = series.toDF()
    val out = CandleOps.recentTopK(df, 3, Seq($"start".desc, $"symbol".asc))
      .select("symbol", "start").as[(String, Timestamp)].collect()
    assert(out.head == (("BTC-USDT", ts("2024-03-01 08:59:00"))))
    assert(out.length == 3)
  }

  test("bollinger: exact rolling mid and k-sigma bands in cents") {
    val closes = Seq(
      ("S", ts("2024-03-01 08:00:00"), 1.0),
      ("S", ts("2024-03-01 09:00:00"), 2.0),
      ("S", ts("2024-03-01 10:00:00"), 3.0)
    ).toDF("sym", "bucket_ts", "close")
    val got = CandleOps.bollinger(closes, Seq("sym"), "bucket_ts", "close",
      nWindow = 2, k = 1)
      .select("close_cents", "n_in_frame", "mid_cents", "upper_cents", "lower_cents")
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    // frame of 2: pop-sigma of {100,200} = 50 cents
    assert(got == Seq(
      (100L, 1L, 100.0, 100.0, 100.0),
      (200L, 2L, 150.0, 200.0, 100.0),
      (300L, 2L, 250.0, 300.0, 200.0)))
  }

  test("rsi: gains/losses over close moves, flat window is NULL") {
    val closes = Seq(
      ("S", ts("2024-03-01 08:00:00"), 1.0),
      ("S", ts("2024-03-01 09:00:00"), 2.0),
      ("S", ts("2024-03-01 10:00:00"), 1.5),
      ("S", ts("2024-03-01 11:00:00"), 1.5)
    ).toDF("sym", "bucket_ts", "close")
    val got = CandleOps.rsi(closes, Seq("sym"), "bucket_ts", "close", nWindow = 2)
      .select("bucket_ts", "gains_cents", "losses_cents", "rsi")
      .as[(Timestamp, Long, Long, Option[Double])].collect().sortBy(_._1.getTime).toSeq
    assert(got.map(t => (t._2, t._3, t._4)) == Seq(
      (0L, 0L, None),                       // no prior close
      (100L, 0L, Some(100.0)),              // pure gain
      (100L, 50L, Some(100.0 * 100 / 150)), // one IEEE division
      (0L, 50L, Some(0.0))))                // pure loss
  }

  test("resampleFfill emits the full grid and carries the last close over gaps") {
    val sparse = Seq(
      ("S", ts("2024-03-01 10:00:00"), 1.0),
      ("S", ts("2024-03-01 13:00:00"), 4.0), // 11:00 and 12:00 missing
      ("T", ts("2024-03-01 10:00:00"), 9.0)  // single bucket: no grid growth
    ).toDF("sym", "bucket_ts", "close")
    val got = CandleOps.resampleFfill(sparse, Seq("sym"), "bucket_ts", "close", "1h")
      .select("sym", "bucket_ts", "close", "filled")
      .as[(String, Timestamp, Double, Boolean)].collect().sortBy(t => (t._1, t._2.getTime)).toSeq
    assert(got == Seq(
      ("S", ts("2024-03-01 10:00:00"), 1.0, false),
      ("S", ts("2024-03-01 11:00:00"), 1.0, true), // synthesized, ffilled
      ("S", ts("2024-03-01 12:00:00"), 1.0, true),
      ("S", ts("2024-03-01 13:00:00"), 4.0, false),
      ("T", ts("2024-03-01 10:00:00"), 9.0, false)))
  }

  test("ema matches the hand-computed truncated EWMA and hits SMA/last-value edges") {
    // n=2: weights (1)^j(3)^(1-j) -> [3, 1]; ema = (3*x_t + x_{t-1}) / 4
    val closes = Seq(
      ("S", ts("2024-03-01 10:00:00"), 1.0),
      ("S", ts("2024-03-01 11:00:00"), 2.0),
      ("S", ts("2024-03-01 12:00:00"), 2.0) // equal closes: ema == close
    ).toDF("sym", "bucket_ts", "close")
    val got = CandleOps.ema(closes, Seq("sym"), "bucket_ts", "close", nWindow = 2)
      .select("bucket_ts", "close_cents", "ema_cents")
      .as[(Timestamp, Long, Double)].collect().sortBy(_._1.getTime).toSeq
    assert(got == Seq(
      (ts("2024-03-01 10:00:00"), 100L, 100.0),          // first row: weight renormalizes to itself
      (ts("2024-03-01 11:00:00"), 200L, (3.0 * 200 + 100) / 4),
      (ts("2024-03-01 12:00:00"), 200L, 200.0)))
    // weight-cap contract is loud, not silent
    intercept[IllegalArgumentException] {
      CandleOps.ema(closes, Seq("sym"), "bucket_ts", "close", nWindow = 21)
    }
  }
}
