package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CandleOps, MicrostructureOps}

/** Semantics of the microstructure family on hand-computable series.
  * Every operator publishes exact integer evidence columns next to its
  * one-division double, so the assertions here check BOTH: the integer
  * core against pencil-and-paper values, and the double against the
  * same single IEEE operation performed in the test.
  */
class MicrostructureSpec extends SparkSpec {
  import spark.implicits._

  private def bars(rows: Seq[(String, Int, Double, Double, Double, Double)]): DataFrame =
    rows.map { case (k, i, o, h, l, c) =>
      (k, Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00"), o, h, l, c,
        1L, 100.0)
    }.toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")

  test("williamsR: close at the high is 0, at the low is -100, mid-range -50") {
    val df = bars(Seq(
      ("A", 0, 1.0, 10.0, 2.0, 10.0), // close == HH -> 0
      ("A", 1, 1.0, 8.0, 2.0, 2.0),   // HH=10, LL=2, close=2 -> -100
      ("A", 2, 1.0, 8.0, 2.0, 6.0)))  // HH=10, LL=2, close=6 -> -50
    val out = MicrostructureOps.williamsR(df, Seq("sym"), "bucket_ts", nWindow = 14)
      .orderBy("bucket_ts").select("willr").as[Double].collect()
    assert(out.toSeq == Seq(0.0, -100.0, -50.0))
  }

  test("williamsR: flat envelope reports NULL, not a synthetic midpoint") {
    val df = bars(Seq(("A", 0, 5.0, 5.0, 5.0, 5.0)))
    val out = MicrostructureOps.williamsR(df, Seq("sym"), "bucket_ts", 5)
      .select("willr").collect()
    assert(out.head.isNullAt(0))
  }

  test("aroon: bars-since counts from the extreme; ties go to the most recent bar") {
    // highs: 10, 10, 7 — the tied high at bar 1 wins, so at bar 2
    // bars_since_high = 1 (not 2); lows 3, 1, 1 — tie at bar 2 wins.
    val df = bars(Seq(
      ("A", 0, 1.0, 10.0, 3.0, 5.0),
      ("A", 1, 1.0, 10.0, 1.0, 5.0),
      ("A", 2, 1.0, 7.0, 1.0, 5.0)))
    val out = MicrostructureOps.aroon(df, Seq("sym"), "bucket_ts", nWindow = 14)
      .orderBy("bucket_ts")
      .select("bars_since_high", "bars_since_low", "aroon_up", "aroon_down")
      .as[(Long, Long, Double, Double)].collect()
    assert(out(0) == ((0L, 0L, 100.0, 100.0)))
    assert(out(1) == ((0L, 0L, 100.0, 100.0)))
    assert(out(2)._1 == 1L) // high printed 1 bar ago (tie resolved recent)
    assert(out(2)._2 == 0L) // low tie at the current bar
    assert(out(2)._3 == (3 - 1) * 100.0 / 3)
  }

  test("aroon: out-of-range cents raise instead of silently mis-ranking") {
    // 2e10 dollars = 2e12 cents: inside long range (so the ANSI cast
    // passes) but past the 2^30-cent pack bound — the guard must fire.
    val df = bars(Seq(("A", 0, 1.0, 2e10, 1.0, 1.0)))
    val ex = intercept[Exception] {
      MicrostructureOps.aroon(df, Seq("sym"), "bucket_ts", 5).collect()
    }
    assert(ex.getMessage.contains("pack-exact bound")
      || ex.getCause != null && ex.getCause.getMessage.contains("pack-exact bound"))
  }

  test("mfi: rising typical price is all-positive flow (100), falling all-negative (0)") {
    def bar(k: String, i: Int, px: Double, vol: Double) =
      (k, Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00"),
        px, px, px, px, 1L, vol)
    val df = Seq(
      bar("UP", 0, 1.0, 10.0), bar("UP", 1, 2.0, 10.0), bar("UP", 2, 3.0, 10.0),
      bar("DN", 0, 3.0, 10.0), bar("DN", 1, 2.0, 10.0), bar("DN", 2, 1.0, 10.0))
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    val out = MicrostructureOps.mfi(df, Seq("sym"), "bucket_ts", 14)
      .filter(col("bucket_ts") === "2024-01-01 02:00:00")
      .select("sym", "mfi").as[(String, Double)].collect().toMap
    assert(out("UP") == 100.0)
    assert(out("DN") == 0.0)
  }

  test("mfi: first bar and flat bars feed neither side") {
    val df = bars(Seq(
      ("A", 0, 5.0, 5.0, 5.0, 5.0),
      ("A", 1, 5.0, 5.0, 5.0, 5.0)))
    val out = MicrostructureOps.mfi(df, Seq("sym"), "bucket_ts", 5)
      .select("pos_flow", "neg_flow", "mfi").as[(Long, Long, Option[Double])]
      .collect()
    assert(out.forall(r => r._1 == 0L && r._2 == 0L && r._3.isEmpty))
  }

  test("cci: matches the hand-computed mean deviation on a 3-bar window") {
    // tp3 values (h=l=c=px): 3*px*100 -> 300, 600, 1200
    // At bar 2 (window of 3): m=3, S=2100, devs |3*300-2100|=1200,
    // |3*600-2100|=300, |3*1200-2100|=1500 -> dev_sum=3000
    // tp3_dev = 3*1200-2100 = 1500; cci = 3*1500*1000 / (3000*15) = 100.0
    val df = bars(Seq(
      ("A", 0, 1.0, 1.0, 1.0, 1.0),
      ("A", 1, 2.0, 2.0, 2.0, 2.0),
      ("A", 2, 4.0, 4.0, 4.0, 4.0)))
    val out = MicrostructureOps.cci(df, Seq("sym"), "bucket_ts", nWindow = 3)
      .orderBy("bucket_ts").select("tp3_dev", "dev_sum", "cci")
      .as[(Long, Long, Option[Double])].collect()
    assert(out(2)._1 == 1500L)
    assert(out(2)._2 == 3000L)
    assert(out(2)._3.contains(100.0))
    // bar 0: single-element window deviates 0 from itself -> NULL cci
    assert(out(0)._2 == 0L && out(0)._3.isEmpty)
  }

  test("rollSpread: a pure bid-ask bounce of +/-s/2 recovers spread s") {
    // Price alternates 100, 101, 100, 101... -> moves +100,-100,+100...
    // cov(dt,dp) = -10000 (every adjacent pair is opposite-signed),
    // spread = 2*sqrt(10000) = 200 cents = the true bounce width 1.00*2?
    // With half-spread 50c the bounce is +/-100c; Roll gives 2*sqrt(cov-)
    val px = (0 until 20).map(i => if (i % 2 == 0) 100.0 else 101.0)
    val df = bars(px.zipWithIndex.map { case (p, i) => ("A", i, p, p, p, p) })
    val out = MicrostructureOps.rollSpread(df, Seq("sym"), "bucket_ts")
      .select("n_pairs", "roll_spread_cents").as[(Long, Double)].collect()
    val (n, s) = out.head
    assert(n == 18L)
    // exact co-moments: dt,dp in {+100,-100}, always opposite ->
    // sxy = -18*10000; sx=sy=0 except boundary terms; compute directly:
    val moves = px.sliding(2).map { case Seq(a, b) => math.round(b * 100) - math.round(a * 100) }.toSeq
    val pairs = moves.sliding(2).map { case Seq(p, t) => (t, p) }.toSeq
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val nn = pairs.size.toLong
    val want = 2.0 * math.sqrt((sx * sy - nn * sxy).toDouble / (nn * nn).toDouble)
    assert(s == want)
    assert(math.abs(s - 200.0) < 25.0) // ~the bounce width in cents
  }

  test("rollSpread: trending prices (positive autocov) report NULL spread") {
    val df = bars((0 until 10).map(i => ("A", i, 1.0 + i, 1.0 + i, 1.0 + i, 1.0 + i)))
    val out = MicrostructureOps.rollSpread(df, Seq("sym"), "bucket_ts")
      .select("roll_spread_cents").collect()
    assert(out.head.isNullAt(0))
  }

  test("kyleLambda: a perfect linear impact d = lambda * signed_volume is recovered exactly") {
    // volume=|d|/lambda with lambda=0.01 cents per volume-cent:
    // choose moves +200,-400,+600 cents, volumes 20000,40000,60000 cents
    // (volume col is dollars: 200.0, 400.0, 600.0)
    val rows = Seq(
      ("A", 0, 100.00, 0.0), // base px 100.00
      ("A", 1, 102.00, 200.0), // +200c, v=20000c, sv=+20000
      ("A", 2, 98.00, 400.0), // -400c, sv=-40000
      ("A", 3, 104.00, 600.0)) // +600c, sv=+60000
    val df = rows.map { case (k, i, px, vol) =>
      (k, Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00"), px, px, px, px, 1L, vol)
    }.toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    val out = MicrostructureOps.kyleLambda(df, Seq("sym"), "bucket_ts")
      .select("n_moves", "kyle_lambda").as[(Long, Double)].collect().head
    assert(out._1 == 3L)
    assert(out._2 == 0.01) // exact: the OLS of a perfectly linear relation
  }

  test("amihud: cents moved per cent of volume, per day, ratio of sums") {
    val rows = Seq(
      ("A", "2024-01-01 01:00:00", 100.00, 100.0),
      ("A", "2024-01-01 02:00:00", 101.00, 300.0), // +100c on 30000c vol
      ("A", "2024-01-01 03:00:00", 100.00, 100.0), // -100c on 10000c vol
      ("A", "2024-01-02 01:00:00", 105.00, 100.0), // new day: +500c/10000c
      ("A", "2024-01-02 02:00:00", 105.00, 100.0)) // flat: abs 0
    val df = rows.map { case (k, t, px, vol) =>
      (k, Timestamp.valueOf(t), px, px, px, px, 1L, vol) }
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    val out = MicrostructureOps.amihud(df, Seq("sym"), "bucket_ts")
      .orderBy("day")
      .select("n_moves", "sum_abs_move_cents", "sum_volume_cents", "illiq")
      .as[(Long, Long, Long, Double)].collect()
    assert(out(0) == ((2L, 200L, 40000L, 200.0 / 40000.0)))
    // day 2: the 01:00 bar's lag crosses midnight FROM day 1 — its move
    // belongs to day 2 (the day the move printed on)
    assert(out(1) == ((2L, 500L, 20000L, 500.0 / 20000.0)))
  }

  test("vpin: volume-clock buckets, tick-rule imbalance, first bar excluded") {
    val rows = Seq(
      ("2024-01-01 00:00:00", 100.0, 1.0), // no prior close: off the clock
      ("2024-01-01 01:00:00", 101.0, 2.0), // +200c signed, cum 200
      ("2024-01-01 02:00:00", 100.0, 1.0), // -100c signed, cum 300
      ("2024-01-01 03:00:00", 102.0, 3.0)) // +300c signed, cum 600
    val df = rows.map { case (t, px, vol) =>
      ("A", Timestamp.valueOf(t), px, px, px, px, 1L, vol) }
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    val out = MicrostructureOps.vpin(df, Seq("sym"), "bucket_ts",
      bucketVolumeCents = 300L)
      .select("vol_bucket", "n_bars", "imbalance_cents", "total_cents", "toxicity_bps")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, 2L, 100L, 300L, 100.0 * 10000 / 300),
      (1L, 1L, 300L, 300L, 10000.0)))
    // the exact-cents core on pre-quantized longs is bit-identical to
    // the double wrapper on the same bars
    val pre = rows.map { case (t, px, vol) =>
      ("A", Timestamp.valueOf(t), (px * 100).toLong, (vol * 100).toLong) }
      .toDF("sym", "bucket_ts", "close_cents", "vol_cents")
    val outCents = MicrostructureOps.vpinFromCents(
      pre, Seq("sym"), "bucket_ts", "close_cents", "vol_cents", 300L)
      .select("vol_bucket", "n_bars", "imbalance_cents", "total_cents", "toxicity_bps")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(outCents == out)
  }

  test("varianceRatio: perfect mean reversion scores 0, a flat base NULLs, a known series matches hand co-moments") {
    // alternating +/-1.00 bounce: every 2-period move is exactly 0
    val alt = bars((0 until 12).map(i =>
      ("A", i, 0.0, 0.0, 0.0, if (i % 2 == 0) 100.0 else 101.0)))
    val vr = MicrostructureOps.varianceRatio(alt, Seq("sym"), "bucket_ts", q = 2)
      .select("n_1", "n_q", "variance_ratio")
      .as[(Long, Long, Option[Double])].collect().head
    assert(vr == ((11L, 10L, Some(0.0))))
    // constant price: 1-period variance 0 -> NULL, not a division blowup
    val flat = bars((0 until 6).map(i => ("A", i, 0.0, 0.0, 0.0, 50.0)))
    val out = MicrostructureOps.varianceRatio(flat, Seq("sym"), "bucket_ts", q = 2)
      .select("variance_ratio").collect().head
    assert(out.isNullAt(0))
    // arbitrary series: bit-equal to the formula computed in the test
    val px = Seq(100.0, 101.5, 100.2, 102.7, 101.9, 103.3, 102.0, 104.4)
    val s = bars(px.zipWithIndex.map { case (p, i) => ("A", i, 0.0, 0.0, 0.0, p) })
    val got = MicrostructureOps.varianceRatio(s, Seq("sym"), "bucket_ts", q = 3)
      .select("variance_ratio").as[Double].collect().head
    val cl = px.map(p => math.round(p * 100))
    val d1 = cl.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    val dq = cl.indices.drop(3).map(i => cl(i) - cl(i - 3))
    def mom(d: Seq[Long]) = (d.size.toLong, d.sum, d.map(x => x * x).sum)
    val (n1, s1, s11) = mom(d1); val (nq, sq, sqq) = mom(dq)
    val want = ((nq * sqq - sq * sq) * n1 * n1).toDouble /
      ((n1 * s11 - s1 * s1) * nq * nq * 3).toDouble
    assert(got == want)
  }

  test("olsSeasonalTrend recovers a planted trend + weekend shift exactly") {
    // y = 10000 + 5*x1 + 300*weekend cents; 2024-01-01 is a Monday
    val rows = Seq(
      ("2024-01-01 00:00:00", 100.00), // x1=0,   weekday
      ("2024-01-01 01:00:00", 100.05), // x1=1
      ("2024-01-02 05:00:00", 101.45), // x1=29
      ("2024-01-06 00:00:00", 109.00), // x1=120, saturday: +300
      ("2024-01-07 03:00:00", 110.35)) // x1=147, sunday:   +300
    val df = rows.map { case (t, px) =>
      ("A", Timestamp.valueOf(t), px, px, px, px, 1L, 1.0) }
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    val out = MicrostructureOps.olsSeasonalTrend(
      df, Seq("sym"), "bucket_ts", originTs = "2024-01-01 00:00:00")
      .select("n_obs", "intercept_cents", "trend_cents_per_hour", "weekend_shift_cents")
      .as[(Long, Double, Double, Double)].collect().head
    // a perfect fit: each Cramer numerator is exactly coefficient*det,
    // so the one division returns the coefficient bit-exactly
    assert(out == ((5L, 10000.0, 5.0, 300.0)))
  }

  test("olsSeasonalTrend: a constant regressor makes the system singular -> NULLs, not garbage") {
    val rows = Seq( // all weekdays: x2 identically 0
      ("2024-01-01 00:00:00", 100.00),
      ("2024-01-01 01:00:00", 100.05),
      ("2024-01-02 05:00:00", 101.45))
    val df = rows.map { case (t, px) =>
      ("A", Timestamp.valueOf(t), px, px, px, px, 1L, 1.0) }
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    val out = MicrostructureOps.olsSeasonalTrend(
      df, Seq("sym"), "bucket_ts", originTs = "2024-01-01 00:00:00").collect().head
    assert(out.getAs[Double]("det") == 0.0)
    assert(out.isNullAt(out.fieldIndex("trend_cents_per_hour")))
  }

  test("leadLagCorr: a key that copies the benchmark an hour later peaks at lag +1") {
    val benchPx = Seq(100.00, 101.00, 100.50, 102.00, 101.00,
      103.00, 102.50, 104.00, 103.00, 105.00)
    def row(k: Long, i: Int, px: Double) =
      (k, Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00"), px, px, px, px, 1L, 1.0)
    val bench = benchPx.zipWithIndex.map { case (p, i) => row(7L, i, p) }
    val follower = benchPx.zipWithIndex.map { case (p, i) => row(1L, i + 1, p) }
    val df = (bench ++ follower)
      .toDF("user_id", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    val out = MicrostructureOps.leadLagCorr(
      df, "user_id", "bucket_ts", col("user_id") === 7, maxLag = 2)
      .select("user_id", "lag_steps", "n_aligned", "xcorr")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // the follower's move series IS the benchmark's shifted +1h: all 9
    // aligned pairs identical -> exact 1.0 (co-moments stay under 2^53)
    assert(out((1L, 1L)) == ((9L, Some(1.0))))
    // at lag 0 the sequences are genuinely different
    assert(out((1L, 0L))._2.exists(_ < 1.0))
    // the benchmark never correlates against itself
    assert(!out.keySet.exists(_._1 == 7L))
  }

  test("corrMatrix: co-moving keys corr=1, anti-moving corr=-1, key_a < key_b only") {
    // Small cent moves keep every co-moment product under 2^53, so the
    // perfect-correlation sqrt is of an exactly-representable perfect
    // square and the +/-1.0 comparison below is exact, not approximate.
    def series(k: String, mul: Int) = (0 until 12).map { i =>
      val px = 100.0 + mul * 0.01 * (if (i % 2 == 0) i else -i)
      (k, Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00"), px, px, px, px, 1L, 1.0)
    }
    val df = (series("a1", 1) ++ series("a2", 2) ++ series("b1", -1))
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    val out = MicrostructureOps.corrMatrix(df, "sym", "bucket_ts")
      .select("key_a", "key_b", "corr").as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out.keySet == Set(("a1", "a2"), ("a1", "b1"), ("a2", "b1")))
    assert(out(("a1", "a2")) == 1.0)
    assert(out(("a1", "b1")) == -1.0)
    assert(out(("a2", "b1")) == -1.0)
    // the quadratic shape is gated: a universe past maxUniverse raises
    // with a pointer to the scale path before the pair join processes a
    // row. The guard is LAZY (round 10): building the plan runs no
    // Spark job — proven by building over a poisoned frame whose every
    // executed row raises — and the raise happens at execution
    val poisoned = df.withColumn("sym",
      when(col("trades") < Long.MinValue, col("sym"))
        .otherwise(raise_error(lit("corrMatrix builder must not run a job"))))
    MicrostructureOps.corrMatrix(poisoned, "sym", "bucket_ts") // builds clean
    val gated = MicrostructureOps.corrMatrix(df, "sym", "bucket_ts", maxUniverse = 2)
    val guard = intercept[Exception] { gated.collect() }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: chain(e.getCause))
    assert(chain(guard).exists(m => m != null && m.contains("corrScreen")),
      s"guard message missing scale-path pointer: ${chain(guard)}")
  }

  test("corrScreen: planted copycats surface at hamming 0 with the matrix's exact corr; independents don't") {
    // Two co-moving keys (identical sign pattern -> identical
    // fingerprint -> hamming 0, guaranteed candidate at every band
    // width) among noise keys with independent deterministic sign
    // patterns. 40 buckets give the 64-axis sketch enough votes that
    // distinct patterns land far apart in hamming.
    def series(k: String, signAt: Int => Int) = (0 until 40).map { i =>
      val px = 100.0 + 0.01 * (0 to i).map(signAt).sum
      (k, Timestamp.valueOf(
        f"2024-01-0${1 + i / 24}%d ${i % 24}%02d:00:00"), px, px, px, px, 1L, 1.0)
    }
    val rnd = (seed: Int) => (i: Int) =>
      if (((i * 2654435761L + seed * 40503L) >>> 16 & 1L) == 1L) 1 else -1
    val df = (series("cp1", rnd(7)) ++ series("cp2", rnd(7)) ++
      series("n1", rnd(11)) ++ series("n2", rnd(23)) ++ series("n3", rnd(31)))
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    for (bits <- Seq(8, 16, 32)) {
      val out = MicrostructureOps.corrScreen(
        df, "sym", "bucket_ts", maxHamming = 7, bandBits = bits)
        .select("key_a", "key_b", "hamming", "corr")
        .as[(String, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      assert(out.contains(("cp1", "cp2")), s"bandBits=$bits missed the copycats")
      val (ham, corr) = out(("cp1", "cp2"))
      assert(ham == 0L, s"bandBits=$bits: copycat hamming $ham")
      assert(corr == 1.0, s"bandBits=$bits: copycat corr $corr")
    }
    // the screened pair's corr is bit-identical to the full matrix's entry
    val full = MicrostructureOps.corrMatrix(df, "sym", "bucket_ts")
      .filter(col("key_a") === "cp1" && col("key_b") === "cp2")
      .select("corr").as[Double].head()
    assert(full == 1.0)
  }

  test("corrScreenSigned: a planted mirror key surfaces anti_moving with corr -1") {
    // 320 hourly buckets: every axis of the 64-axis sketch is hit whp,
    // and varied move magnitudes (1 + i%5 cents) make zero-sum axes
    // rare — the two residual ways an axis can fail to complement.
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def series(k: String, moveAt: Int => Int) = (0 until 320).map { i =>
      val px = 200.0 + 0.01 * (0 to i).map(moveAt).sum
      (k, new Timestamp(t0 + i * 3600000L), px, px, px, px, 1L, 1.0)
    }
    val rnd = (seed: Int) => (i: Int) => {
      val mag = 1 + i % 5
      if (((i * 2654435761L + seed * 40503L) >>> 16 & 1L) == 1L) mag else -mag
    }
    val base = rnd(5)
    val mirror = (i: Int) => -base(i)
    val df = (series("up", base) ++ series("dn", mirror) ++
      series("n1", rnd(13)) ++ series("n2", rnd(29)))
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    val out = MicrostructureOps.corrScreenSigned(
      df, "sym", "bucket_ts", maxHamming = 7, bandBits = 8)
      .select("key_a", "key_b", "side", "hamming", "corr")
      .as[(String, String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    // the mirrored pair: complement fingerprints -> anti side, distance
    // to complement 0, exact corr the full matrix's -1
    val (ham, corr) = out(("dn", "up", "anti_moving"))
    // ham counts the axes that failed to complement (empty or
    // zero-sum): 0 when every axis voted, tiny otherwise
    assert(ham <= 3L, s"anti hamming $ham")
    assert(corr.contains(-1.0))
    // mirror pairs never leak onto the co side at a tight radius
    assert(!out.contains(("dn", "up", "co_moving")))
  }
}
