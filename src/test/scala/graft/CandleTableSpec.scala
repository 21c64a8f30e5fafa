package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.api.CandleTable
import graft.model.Candle

/** The user-facing facade end-to-end: validate → dedup → rollup →
  * gaps/freshness on one chained lazy plan.
  */
class CandleTableSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def mk(sym: String, start: String, o: Double, receipt: String = null,
      h: Double = Double.NaN): Candle = {
    val st = ts(start)
    val stop = new Timestamp(st.getTime + 60000)
    val hi = if (h.isNaN) o + 2 else h
    Candle("BINANCE", sym, "1m", st, stop, stop.getTime / 1000, 3,
      o, hi, o - 1, o + 1, 10.0, stop, if (receipt == null) stop else ts(receipt))
  }

  private lazy val raw: Seq[Candle] =
    (0 until 120).map(m => mk("BTC", f"2024-03-01 ${8 + m / 60}%02d:${m % 60}%02d:00", 100.0 + m)) ++
      Seq(
        mk("BTC", "2024-03-01 08:30:00", 555.0, receipt = "2024-03-01 10:00:00"), // dup, later writer
        mk("BTC", "2024-03-01 08:31:00", 1.0, h = 0.5)                            // CHECK-violating (high < open)
      )

  test("validate -> dedup -> rollup chains into correct OHLCV") {
    val t = CandleTable(raw.toDF()).validated.deduped
    assert(t.df.count() == 120) // dup collapsed, invalid row dropped... but 08:31 original remains
    val r = t.rollup("1h").orderBy("bucket_ts").collect()
    assert(r.length == 2)
    val h0 = r(0)
    assert(h0.getAs[Double]("open") == 100.0)
    assert(h0.getAs[Double]("high") == 557.0)   // dup winner's high = 555+2
    assert(h0.getAs[Long]("trades") == 60 * 3L)
    assert(h0.getAs[Double]("volume") == 600.0)
  }

  test("indicator facades delegate to CandleOps over the same rollup") {
    val t = CandleTable(raw.toDF()).validated.deduped
    val viaFacade = t.bollinger("1h", nWindow = 2, k = 1)
      .orderBy("bucket_ts").collect().toSeq
    val direct = graft.operators.CandleOps.bollinger(t.rollup("1h"),
        Seq("exchange", "symbol"), "bucket_ts", "close", 2, 1)
      .orderBy("bucket_ts").collect().toSeq
    assert(viaFacade == direct && viaFacade.nonEmpty)
    val rsiRows = t.rsi("1h", nWindow = 2).collect()
    assert(rsiRows.length == direct.length)
  }

  test("gap scan and freshness on the deduped view") {
    val holes = raw.filterNot(c =>
      c.start == ts("2024-03-01 08:10:00") || c.start == ts("2024-03-01 08:11:00"))
    val t = CandleTable(holes.toDF()).validated.deduped
    val missing = t.missingBuckets("1m").select("bucket_ts").as[Timestamp].collect().toSet
    assert(missing == Set(ts("2024-03-01 08:10:00"), ts("2024-03-01 08:11:00")))
    val stale = t.freshness(lit("2024-03-01 10:00:00").cast("timestamp"))
      .select("is_stale").as[Boolean].head()
    assert(!stale) // last candle starts 09:59 → 1 min lag < the 2-min SLO
    val stale2 = t.freshness(lit("2024-03-01 10:05:00").cast("timestamp"))
      .select("is_stale").as[Boolean].head()
    assert(stale2) // 6 min lag > SLO
  }

  test("sessions split the continuous stream only at real lulls") {
    // 120 contiguous minutes -> one session; add a burst 3h later
    val later = Seq(
      mk("BTC", "2024-03-01 13:00:00", 200.0),
      mk("BTC", "2024-03-01 13:01:00", 201.0))
    val s = CandleTable((raw ++ later).toDF()).validated.deduped
      .sessions(gap = "30 minutes")
      .orderBy("session_start")
      .collect()
    assert(s.length == 2)
    assert(s(0).getAs[Long]("n_events") == 120 && s(1).getAs[Long]("n_events") == 2)
  }

  test("backfill plan tiles from start date to earliest candle") {
    val t = CandleTable(raw.toDF())
    val plan = t.backfillPlan("2024-03-01 06:00:00", "1m", chunkOf = 30)
    assert(plan.count() == 4) // 06:00→08:00 in 30-minute chunks
  }

  test("indicator facade delegates carry the operator column contracts") {
    val t = CandleTable(raw.toDF()).validated.deduped
    assert(t.stochastic("15m").columns.contains("k_slow"))
    assert(t.atr("15m").columns.contains("atr_cents"))
    assert(t.donchian("15m").columns.contains("position"))
    assert(t.obv("15m").columns.contains("obv_cents"))
    assert(t.macd("15m").columns.contains("hist_micro"))
    assert(t.pivotPoints("1h").columns.contains("r2"))
    assert(t.volumeProfile("15m").columns.contains("share"))
    assert(t.drawdown("15m").columns.contains("max_dd_frac"))
    // each runs: a facade wiring bug (wrong key set, missing column)
    // surfaces as an execution error, not just a schema mismatch
    assert(t.stochastic("15m").count() > 0 && t.macd("15m").count() > 0)
    assert(t.volumeProfile("15m").count() > 0)
  }

  test("microstructure facades carry the operator column contracts and run") {
    val t = CandleTable(spark.createDataFrame(raw)).validated.deduped
    assert(t.williamsR("15m").columns.contains("willr"))
    assert(t.aroon("15m").columns.contains("aroon_up"))
    assert(t.mfi("15m").columns.contains("mfi"))
    assert(t.cci("15m").columns.contains("cci"))
    assert(t.rollSpread("15m").columns.contains("roll_spread_cents"))
    assert(t.kyleLambda("15m").columns.contains("kyle_lambda"))
    assert(t.amihud("15m").columns.contains("illiq"))
    assert(t.varianceRatio("15m").columns.contains("variance_ratio"))
    assert(t.vpin("15m", 1000L).columns.contains("toxicity_bps"))
    assert(t.williamsR("15m").count() > 0 && t.aroon("15m").count() > 0)
    assert(t.cci("15m").count() > 0 && t.mfi("15m").count() > 0)
    assert(t.holtBrown("15m").columns.contains("forecast_micro"))
    assert(t.ewmaVolatility("15m").columns.contains("ewma_vol_cents"))
    assert(t.holtBrown("15m").count() > 0 && t.ewmaVolatility("15m").count() > 0)
  }

  test("corrScreen facade pairs the symbol key; packedSeries round-trips its codec cells") {
    val two = raw ++ raw.map(c => c.copy(symbol = "ETH"))
    val t = CandleTable(spark.createDataFrame(two)).validated.deduped
    // identical series -> identical sign fingerprints -> hamming 0;
    // this fixture's closes rise by a CONSTANT step, so the move
    // variance is zero and corr is correctly NULL (the degenerate-
    // series convention every indicator in the family follows)
    val screen = t.corrScreen("15m").collect()
    assert(screen.length == 1)
    assert(screen.head.getAs[Long]("hamming") == 0L)
    assert(screen.head.isNullAt(screen.head.fieldIndex("corr")))
    val packed = t.packedSeries("15m")
    assert(packed.columns.toSet ==
      Set("exchange", "symbol", "n_buckets", "ts_cell", "px_cell", "px_cents_cell"))
    // cells decode back to the rollup's own series
    import graft.functions.Codecs
    val check = packed.select(
      (size(Codecs.dd_decode(col("ts_cell"))) === col("n_buckets")).as("tn"),
      (size(Codecs.gorilla_decode(col("px_cell"))) === col("n_buckets")).as("pn"))
      .as[(Boolean, Boolean)].collect()
    assert(check.nonEmpty && check.forall(r => r._1 && r._2))
  }
}
