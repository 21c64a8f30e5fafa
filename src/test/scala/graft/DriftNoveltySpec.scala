package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.EventOps

/** Round-5 additions: exact KS drift (planted disjoint vs identical
  * distributions), stats-drift gate semantics (null-rate flag, range
  * widening), n-gram novelty ownership, bigram fluency floor-milli
  * arithmetic — all with the bit-identical-under-repartitioning
  * contract that backs their oracle hash-matches.
  */
class DriftNoveltySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val split = "2024-01-16 00:00:00"
  private val before = ts("2024-01-10 00:00:00")
  private val after = ts("2024-01-20 00:00:00")

  // type "moved": cohorts fully disjoint (A in 1..4, B in 11..14) ->
  // KS statistic exactly 1; type "same": identical cohorts -> 0
  private lazy val ksEvents: DataFrame = (
    (1 to 4).map(i => ("moved", before, i.toDouble)) ++
      (11 to 14).map(i => ("moved", after, i.toDouble)) ++
      (1 to 3).map(i => ("same", before, i.toDouble)) ++
      (1 to 3).map(i => ("same", after, i.toDouble))
    ).toDF("event_type", "ts", "value")

  test("driftKs: disjoint cohorts score exactly 1 and drift; identical score 0") {
    val got = EventOps.driftKs(ksEvents, "event_type", "ts", "value", split)
      .as[(String, Long, Long, String, Double, Boolean)]
      .collect().sortBy(_._1).toSeq
    // moved: num = max|fa*nb - fb*na| = 4*4 = 16 once A is fully seen;
    // drifted: 16^2*1000 = 256000 > 1844*(4+4)*4*4 = 236032
    // same: CDFs track exactly -> num 0, ks 0, no drift
    assert(got == Seq(
      ("moved", 4L, 4L, "16", 1.0, true),
      ("same", 3L, 3L, "0", 0.0, false)))
  }

  test("driftKs is bit-identical under repartitioning") {
    def run(df: DataFrame) =
      EventOps.driftKs(df, "event_type", "ts", "value", split)
        .as[(String, Long, Long, String, Double, Boolean)]
        .collect().sortBy(_._1).toSeq
    assert(run(ksEvents.repartition(7)) == run(ksEvents.coalesce(1)))
  }

  test("driftKs rides two exchanges: value grid, then per-type window") {
    val plan = EventOps.driftKs(ksEvents, "event_type", "ts", "value", split)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    // (type, cents) aggregate -> one; window + final per-type
    // aggregate share the second (same key); nothing else may shuffle
    assert(n == 2, s"expected 2 exchanges, got $n:\n$plan")
  }

  test("statsDrift: null-rate flag cross-multiplies exactly; range widening") {
    val rows =
      (1 to 3).map(i => ("t", before, Option(i.toDouble), 100L + i)) ++
        Seq(("t", before, None: Option[Double], 104L)) ++ // A: 1 null of 4
        (1 to 1).map(i => ("t", after, Option(i.toDouble + 20), 200L)) ++
        Seq(("t", after, None, 201L), ("t", after, None, 202L),
          ("t", after, None, 203L)) // B: 3 nulls of 4, max value 21
    val df = rows.toDF("event_type", "ts", "value", "user_id")
    val got = EventOps.statsDrift(df, "event_type", "ts", "value", "user_id",
      split, thresholdMilli = 50L)
      .select("event_type", "n_a", "n_b", "null_a", "null_b",
        "null_shift_milli", "null_drifted", "range_widened")
      .as[(String, Long, Long, Long, Long, Double, Boolean, Boolean)]
      .collect().toSeq
    // shift = |1*4 - 3*4| * 1000 / 16 = 500 milli; 500 > 50 -> drifted;
    // B's max cents 2100 > A's 303 -> widened
    assert(got == Seq(("t", 4L, 4L, 1L, 3L, 500.0, true, true)))
  }

  test("ngramNovelty: first owner keeps the shingle, repeats score zero") {
    val docs = Seq(
      (1L, "a b c d"), // both shingles fresh -> 1.0
      (2L, "a b c d"), // pure copy -> 0.0
      (3L, "a b c x") // one seen, one fresh -> 0.5
    ).toDF("doc_id", "text")
    val got = TextOps.ngramNovelty(docs, "doc_id", "text", shingleSize = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0), (3L, 2L, 1L, 0.5)))
  }

  test("bigramFluency: floor-milli conditional probabilities, invariant to partitioning") {
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    def run(df: DataFrame) =
      TextOps.bigramFluency(df, "doc_id", "text")
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // corpus: n(a,b)=2 n(b,a)=1 n(a,c)=1; prefix(a)=3 prefix(b)=1
    // doc1: 2*(2000 div 3) + 1*(1000 div 1) = 2332 over 3 bigrams
    // doc2: 1000 div 3 = 333 over 1
    val want = Seq(
      (1L, 3L, 2332L, 2332.0 / 3.0), (2L, 1L, 333L, 333.0))
    assert(run(docs) == want)
    assert(run(docs.repartition(5)) == want)
  }

  test("trendSlope recovers an exact planted line and flat series") {
    // y = 200x + 300 cents at hours 0..4 -> slope exactly 200, plus a
    // flat key (slope 0) and a single-point key (den 0 -> null slope)
    val candles = (
      (0 to 4).map(h => ("up", ts(f"2024-01-01 0$h:00:00"), 3.0 + 2.0 * h)) ++
        (0 to 3).map(h => ("flat", ts(f"2024-01-01 0$h:00:00"), 7.0)) ++
        Seq(("one", ts("2024-01-01 00:00:00"), 5.0))
      ).toDF("sym", "bucket_ts", "close")
    val got = graft.operators.CandleOps
      .trendSlope(candles, Seq("sym"), "bucket_ts", "close",
        originTs = "2024-01-01 00:00:00")
      .select("sym", "n_obs", "slope_cents_per_hour", "intercept_cents")
      .as[(String, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("flat", 4L, Some(0.0), Some(700.0)),
      ("one", 1L, None, None),
      ("up", 5L, Some(200.0), Some(300.0))))
  }

  test("giniConcentration: equal totals score 0, a single whale (n-1)/n") {
    def gini(rows: Seq[(Long, Double)]): Double =
      EventOps.giniConcentration(
        rows.toDF("user_id", "value"), "user_id", "value")
        .select("gini").as[Double].head()
    val equal = (1L to 4L).map(u => (u, 10.0))
    assert(gini(equal) == 0.0)
    // one user holds everything: G = (n-1)/n = 0.75 for n = 4
    val whale = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 40.0))
    assert(gini(whale) == 0.75)
    // partition invariance through the distributed ranker
    val mixed = (1L to 9L).map(u => (u, u * 3.0))
    val a = gini(mixed)
    val b = EventOps.giniConcentration(
      mixed.toDF("user_id", "value").repartition(7), "user_id", "value")
      .select("gini").as[Double].head()
    assert(a == b)
  }

  test("resampleInterpolate: exact straight line through gaps, no extrapolation") {
    // observations at hours 0 (100c), 3 (400c) and 5 (200c); hours 1,2
    // interpolate the 0->3 line exactly, hour 4 the 3->5 midpoint; a
    // second key has one point -> its (trivial) grid never extrapolates
    val rollup = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-01 03:00:00"), 4.0),
      ("a", ts("2024-01-01 05:00:00"), 2.0),
      ("b", ts("2024-01-01 07:00:00"), 9.0)
    ).toDF("sym", "bucket_ts", "close")
    val got = graft.operators.CandleOps
      .resampleInterpolate(rollup, Seq("sym"), "bucket_ts", "close", "1h")
      .as[(String, Timestamp, Option[Double], Boolean)]
      .collect().sortBy(r => (r._1, r._2.getTime)).toSeq
    assert(got == Seq(
      ("a", ts("2024-01-01 00:00:00"), Some(1.0), false),
      ("a", ts("2024-01-01 01:00:00"), Some(2.0), true),
      ("a", ts("2024-01-01 02:00:00"), Some(3.0), true),
      ("a", ts("2024-01-01 03:00:00"), Some(4.0), false),
      ("a", ts("2024-01-01 04:00:00"), Some(3.0), true),
      ("a", ts("2024-01-01 05:00:00"), Some(2.0), false),
      ("b", ts("2024-01-01 07:00:00"), Some(9.0), false)))
  }

  test("crossSourceOverlap counts distinct shared shingles, unordered pairs once") {
    val docs = Seq(
      (1L, "x y z w", "s1"), // shingles {x y z, y z w}
      (2L, "x y z q", "s2"), // shares {x y z} with s1
      (3L, "x y z w", "s2"), // duplicate content must not double-count
      (4L, "p q r", "s3") // no overlap with anyone
    ).toDF("doc_id", "text", "source")
    val got = TextOps.crossSourceOverlap(docs, "text")
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // s1 vs s2: {x y z} shared via doc2 AND both of doc3's shingles ->
    // distinct shared set is {x y z, y z w} = 2
    assert(got == Seq(("s1", "s2", 2L)))
  }

  test("autocorrelation: alternating series ~ -1, trend ~ +1, flat null") {
    // alternating 1,3,1,3... -> consecutive pairs perfectly
    // anti-correlated; strictly linear series -> +1; constant series
    // -> zero variance -> null. |r| lands one ulp inside 1 because
    // sqrt(d)*sqrt(d) rounds off d — DETERMINISTICALLY so (the oracle
    // hash-matches); the test pins sign, magnitude, and invariance
    val rollup = (
      (0 to 5).map(h => ("alt", ts(f"2024-01-01 0$h:00:00"),
        if (h % 2 == 0) 1.0 else 3.0)) ++
        (0 to 5).map(h => ("lin", ts(f"2024-01-01 0$h:00:00"), 1.0 + h)) ++
        (0 to 3).map(h => ("flat", ts(f"2024-01-01 0$h:00:00"), 2.0))
      ).toDF("sym", "bucket_ts", "close")
    def run(df: org.apache.spark.sql.DataFrame) = graft.operators.CandleOps
      .autocorrelation(df, Seq("sym"), "bucket_ts", "close", k = 1)
      .select("sym", "n_pairs", "autocorr")
      .as[(String, Long, Option[Double])].collect().sortBy(_._1).toSeq
    val got = run(rollup)
    assert(got.map(r => (r._1, r._2)) ==
      Seq(("alt", 5L), ("flat", 3L), ("lin", 5L)))
    assert(math.abs(got(0)._3.get + 1.0) < 1e-12, s"alt: ${got(0)._3}")
    assert(got(1)._3.isEmpty)
    assert(math.abs(got(2)._3.get - 1.0) < 1e-12, s"lin: ${got(2)._3}")
    assert(run(rollup.repartition(7)) == got)
  }

  test("trimmedMean drops exactly the rank tails and averages the interior") {
    // 10 values 1..10 per type, 10% trim -> drop rank 1 and rank 10:
    // mean of 2..9 = 5.5; an outlier at 1000 in type b lands in the
    // dropped tail, so the trimmed means agree
    val a = (1 to 10).map(i => ("a", i.toLong, i.toDouble))
    val b = (1 to 9).map(i => ("b", i.toLong, i.toDouble)) :+ ("b", 10L, 1000.0)
    val got = EventOps.trimmedMean(
      (a ++ b).toDF("event_type", "event_id", "value"),
      "event_type", "event_id", "value", trimPermille = 100L)
      .select("event_type", "n_kept", "trimmed_mean")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 8L, 5.5), ("b", 8L, 5.5)))
  }

  test("burstiness: constant load scores Fano 0, a spike raises it past 1") {
    // "steady": 4 hours x 3 events -> variance 0 -> fano 0, p2m 1;
    // "spiky": counts 1,1,1,9 -> fano = (4*84 - 144)/(4*12) = 4.0
    val rows =
      (0 until 4).flatMap(h => (1 to 3).map(i =>
        ("steady", ts(f"2024-03-01 0$h:${10 + i}%02d:00")))) ++
        (0 until 3).map(h => ("spiky", ts(f"2024-03-01 0$h:10:00"))) ++
        (1 to 9).map(i => ("spiky", ts(f"2024-03-01 03:${10 + i}%02d:00")))
    val got = EventOps.burstiness(
      rows.toDF("event_type", "ts"), "event_type", "ts")
      .select("event_type", "n_hours", "total_events", "peak_hour_events",
        "fano", "peak_to_mean")
      .as[(String, Long, Long, Long, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("spiky", 4L, 12L, 9L, 4.0, 3.0),
      ("steady", 4L, 12L, 3L, 0.0, 1.0)))
  }

  test("new per-key stats ride one exchange; the event pipelines two") {
    def hashEx(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    val rollup = (0 to 9).map(h =>
      ("s", ts(f"2024-01-01 0$h:00:00"), 2.0 + h % 3))
      .toDF("sym", "bucket_ts", "close")
    // lag window and the moment aggregate share the per-key exchange
    assert(hashEx(graft.operators.CandleOps.autocorrelation(
      rollup, Seq("sym"), "bucket_ts", "close")) == 1)
    // rank window and the interior aggregate share the per-type one
    val ev = (1 to 20).map(i => ("t", i.toLong, i.toDouble))
      .toDF("event_type", "event_id", "value")
    assert(hashEx(EventOps.trimmedMean(ev, "event_type", "event_id",
      "value")) == 1)
    // events -> hourly counts -> per-type moments: two aggregates
    assert(hashEx(EventOps.burstiness(
      ev.withColumn("ts", lit(ts("2024-03-01 08:00:00"))),
      "event_type", "ts")) == 2)
  }

  test("changePoint localizes a planted level shift exactly, one exchange") {
    // 5 values at 1.0 then 5 at 9.0: the CUSUM argmax must land on the
    // last low observation (i = 5) with exact means either side
    val rows = (1 to 10).map(i =>
      ("t", ts(f"2024-03-01 08:${i}%02d:00"), i.toLong,
        if (i <= 5) 1.0 else 9.0))
    val df = rows.toDF("event_type", "ts", "event_id", "value")
    val cp = EventOps.changePoint(df, "event_type", "ts", "event_id", "value")
    val got = cp.select("event_type", "n_obs", "split_idx",
      "mean_before", "mean_after")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("t", 10L, 5L, 1.0, 9.0)))
    assert(cp.as[(String, Long, Timestamp, Long, String, Double, Double)]
      .head()._3 == ts("2024-03-01 08:05:00"))
    val n = "Exchange hashpartitioning".r
      .findAllIn(cp.queryExecution.executedPlan.toString).size
    assert(n == 1, s"expected 1 exchange, got $n")
    // invariance under repartitioning
    val again = EventOps.changePoint(df.repartition(7),
      "event_type", "ts", "event_id", "value")
      .select("event_type", "n_obs", "split_idx", "mean_before", "mean_after")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(again == got)
  }

  test("heikinAshi: seed open, smoothed open, and extreme envelopes are exact") {
    val rollup = Seq(
      ("s", ts("2024-01-01 00:00:00"), 1.0, 3.0, 1.0, 3.0),
      ("s", ts("2024-01-01 01:00:00"), 3.0, 5.0, 3.0, 5.0)
    ).toDF("sym", "bucket_ts", "open", "high", "low", "close")
    val got = graft.operators.CandleOps
      .heikinAshi(rollup, Seq("sym"), "bucket_ts", nWindow = 12)
      .as[(String, Timestamp, Double, Double, Double, Double)]
      .collect().sortBy(_._2.getTime).toSeq
    // bar0: ha_close = (1+3+1+3)/4 = 2, ha_open seeds at (o+c)/2 = 2;
    // bar1: ha_close = 4, ha_open = single-lag EWMA = prior ha_close =
    // 2 exactly; envelopes take the raw extremes where wider
    assert(got == Seq(
      ("s", ts("2024-01-01 00:00:00"), 2.0, 2.0, 3.0, 1.0),
      ("s", ts("2024-01-01 01:00:00"), 2.0, 4.0, 5.0, 2.0)))
  }

  test("driftKs raises past the exact-compare bound instead of NULLing") {
    val big = spark.range(2).select(
      lit("t").as("event_type"),
      when(col("id") === 0, before).otherwise(after).as("ts"),
      col("id").cast("double").as("value"))
    // happy path stays silent at the production bound...
    val ok = EventOps.driftKs(big, "event_type", "ts", "value", split).collect()
    assert(ok.length == 1)
    // ...and the raise path genuinely fires: the bound is injectable,
    // so exactBound=1 makes this 1x1-cohort product trip the guard
    val boom = intercept[Exception] {
      EventOps.driftKs(big, "event_type", "ts", "value", split,
        exactBound = 1L).collect()
    }
    assert(boom.getMessage != null &&
      boom.getMessage.contains("exceeds the decimal(38,0) exact-compare bound"),
      s"unexpected error: ${boom.getMessage}")
  }

  test("heikinAshi raises on cent sums past the long-exact weight bound") {
    // at nWindow=24 the guard bound is Long.MaxValue >> 24 ≈ 5.5e11
    // cents; a $2e9 price makes hc4 = 8e11 and must fail loudly on the
    // LAGGED bar (bar0's hc4 only enters a window frame via bar1)
    val rollup = Seq(
      ("s", ts("2024-01-01 00:00:00"), 2e9, 2e9, 2e9, 2e9),
      ("s", ts("2024-01-01 01:00:00"), 1.0, 1.0, 1.0, 1.0)
    ).toDF("sym", "bucket_ts", "open", "high", "low", "close")
    val boom = intercept[Exception] {
      graft.operators.CandleOps
        .heikinAshi(rollup, Seq("sym"), "bucket_ts", nWindow = 24)
        .collect()
    }
    assert(boom.getMessage != null &&
      boom.getMessage.contains("exceeds the long-exact bound"),
      s"unexpected error: ${boom.getMessage}")
    // and an over-range nWindow is rejected before any plan is built
    assertThrows[IllegalArgumentException] {
      graft.operators.CandleOps.heikinAshi(rollup, Seq("sym"), "bucket_ts", nWindow = 25)
    }
  }
}
