package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextOps, VectorOps}
import graft.operators.{AsOfJoin, CandleOps, GapOps}

/** Degenerate-input robustness: empty tables, single rows, all-equal
  * keys. Operators must return empty/identity results, never throw.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val emptyEvents: DataFrame =
    Seq.empty[(Long, Timestamp, Double)].toDF("user_id", "t", "value")

  test("rollup/dedup/gaps on empty input are empty, not errors") {
    assert(CandleOps.ohlcvRollup(emptyEvents, Seq("user_id"), "t", "value", "15 minutes").count() == 0)
    assert(CandleOps.latestByKey(emptyEvents, Seq("user_id"), "t").count() == 0)
    assert(GapOps.missingBuckets(emptyEvents, Seq("user_id"), "t", "1 hour").count() == 0)
    assert(GapOps.islandRanges(emptyEvents, Seq("user_id"), "t", "1 hour", 3600L).count() == 0)
    assert(GapOps.backfillChunks(emptyEvents, Seq("user_id"), "t",
      lit("2024-01-01 00:00:00").cast("timestamp"), "1 hour", "6 hours").count() == 0)
  }

  test("single-row input: rollup of one point is that point") {
    val one = Seq((1L, ts("2024-01-01 08:07:00"), 42.0)).toDF("user_id", "t", "value")
    val r = CandleOps.ohlcvRollup(one, Seq("user_id"), "t", "value", "15 minutes").head()
    assert(r.getAs[Double]("open") == 42.0 && r.getAs[Double]("close") == 42.0)
    assert(r.getAs[Double]("high") == 42.0 && r.getAs[Double]("low") == 42.0)
    assert(r.getAs[Timestamp]("bucket_ts") == ts("2024-01-01 08:00:00"))
    // no gaps in a single bucket
    assert(GapOps.missingBuckets(one, Seq("user_id"), "t", "15 minutes").count() == 0)
  }

  test("all-duplicate keys collapse to one winner") {
    val dups = (1 to 50).map(i =>
      (7L, ts("2024-01-01 08:00:00"), i.toDouble, i.toLong))
      .toDF("user_id", "t", "value", "version")
    val out = CandleOps.latestByKey(dups, Seq("user_id", "t"), "version")
    assert(out.count() == 1)
    assert(out.head().getAs[Double]("value") == 50.0)
  }

  test("as-of join with empty right side yields all-null matches") {
    val l = Seq((1L, ts("2024-01-01 08:00:00"), 5.0)).toDF("k", "ts", "px")
    val r = Seq.empty[(Long, Timestamp, Double)].toDF("k", "ts", "bid")
    val out = AsOfJoin.asof(l, r, Seq("k"), "ts", Seq("px"), Seq("bid"))
    assert(out.count() == 1)
    assert(out.head().isNullAt(out.head().fieldIndex("asof_bid")))
  }

  test("text ops on empty and whitespace-only docs") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    assert(TextOps.exactDedupGroups(docs, "doc_id", "text").count() == 3)
    val stats = TextOps.textStats(docs, "doc_id", "text").collect()
    assert(stats.length == 3) // ratios may be null/NaN but rows survive
    assert(TextOps.minhashCandidatePairs(docs, "doc_id", "text", 4, 2, 3).count() == 0)
  }

  test("knn with k larger than candidate count returns all candidates") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), (2L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = VectorOps.knnTopK(vecs, "vec_id", "embedding", $"vec_id" === 0, k = 10)
    assert(out.count() == 2)
  }

  test("listing diff of identical sets is empty") {
    val a = Seq(1L, 2L).toDF("user_id")
    assert(GapOps.listingDiff(a, a, Seq("user_id")).count() == 0)
  }

  test("round-2 text ops survive empty/whitespace/short docs") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one"), (4L, "a b")).toDF("doc_id", "text")
    // repetition stats: rows survive; no bigrams for docs under 2 tokens
    val rep = TextOps.repetitionStats(docs, "doc_id", "text").collect()
    assert(rep.length == 4)
    // redaction of PII-free text is identity
    val red = docs.select($"doc_id", TextOps.redactPii($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(red(2L) == "   " && red(3L) == "one")
    // winnowing on short docs: no fingerprints, no crash
    assert(docs.select($"doc_id",
      explode(graft.functions.Winnowing.winnow(TextOps.tokens($"text"), 4, 4)))
      .count() == 0)
    // simhash neardup on a tiny corpus does not error
    assert(TextOps.simhashNearDupPairs(docs, "doc_id", "text", 3).count() >= 0)
  }

  test("splitAssign sends a null id deterministically to the last split") {
    val ids = Seq(Some(1L), None).toDF("id")
    val out = ids.select(TextOps.splitAssign($"id",
        Seq("train" -> 0.5, "test" -> 0.5)).as("s"))
      .as[String].collect().toSet
    // null md5 -> every when() false -> otherwise branch (last split)
    assert(out.contains("test"))
  }

  test("multi-grain gap scan on a single observation emits no ranges") {
    val one = Seq(("A", java.sql.Timestamp.valueOf("2024-03-01 08:00:00"))).toDF("sym", "t")
    assert(GapOps.multiGrainGapScan(one, Seq("sym"), "t",
      Seq(graft.model.Timeframe.parse("1m"))).count() == 0)
  }

  test("salted join with empty sides is empty, not an error") {
    val big = Seq(("A", 1L)).toDF("sym", "v").filter($"v" < 0)
    val small = Seq(("A", 2)).toDF("sym", "meta")
    assert(graft.operators.SkewOps.saltedJoin(big, small, Seq("sym"), 4).count() == 0)
  }

  test("round-3 ops survive empty/degenerate inputs") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one"), (4L, "a b")).toDF("doc_id", "text")
    val empty = docs.filter($"doc_id" < 0)
    // gopher signals: whitespace-only and empty docs get rows, not errors
    assert(TextOps.gopherQualitySignals(docs, "doc_id", "text").count() == 4)
    // capped near-dup paths on empty corpora are empty, not errors
    assert(TextOps.minhashCandidatePairs(empty, "doc_id", "text", 4, 2, 3).count() == 0)
    assert(graft.functions.Winnowing.winnowNearDupPairs(
      empty, "doc_id", "text", 4, 4, 2).count() == 0)
    // bucketCap = 0 drops everything rather than erroring
    assert(TextOps.minhashCandidatePairs(docs, "doc_id", "text", 4, 2, 3,
      bucketCap = 0L).count() == 0)
    // decode stats on non-image/corrupt payloads: rows dropped, no crash
    val junk = Seq(
      graft.operators.MultimodalOps.MediaRow(1L, "image", null, Array[Byte](9, 9, 9), 0, 0, 0L, 0),
      graft.operators.MultimodalOps.MediaRow(2L, "audio", null, Array[Byte](1), 0, 0, 5L, 8000),
      graft.operators.MultimodalOps.MediaRow(3L, "image", null, null, 0, 0, 0L, 0)
    ).toDS()
    assert(graft.operators.MultimodalOps.decodeImageStats(junk, 8, 6).count() == 0)
    // TRUNCATED payloads of a RECOGNIZED format: ImageIO.read throws
    // IIOException here (unlike unrecognized junk, where it returns
    // null) — every image decode path must degrade, not fail the task
    val wholePng = {
      val img = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val truncated = Seq(
      graft.operators.MultimodalOps.MediaRow(
        1L, "image", null, wholePng.take(wholePng.length / 2), 8, 6, 0L, 0),
      graft.operators.MultimodalOps.MediaRow(2L, "image", null, wholePng, 8, 6, 0L, 0)
    ).toDS()
    assert(graft.operators.MultimodalOps.decodeImageStats(truncated, 4, 3)
      .select("media_id").as[Long].collect().toSeq == Seq(2L))
    assert(graft.operators.MultimodalOps.imageDHashes(truncated).count() == 1)
    // degrade-to-metadata contract: codec emits a row for BOTH, the
    // truncated one with the all-zero feature vector
    assert(graft.operators.MultimodalOps.extractFeatures(
      truncated, graft.operators.MultimodalOps.ImageIoCodec).count() == 2)
    // resize passes an undecodable image through untouched
    assert(graft.operators.MultimodalOps.resizeImagesReal(truncated, 4, 3)
      .filter($"media_id" === 1L).head().width == 8)
  }

  test("session-10 ops survive empty/degenerate inputs") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one"), (4L, "a b")).toDF("doc_id", "text")
    val empty = docs.filter($"doc_id" < 0)
    // span dedup: the two whitespace-only docs share their single
    // (empty) block -> both vanish as all-boilerplate; real docs stay
    assert(TextOps.spanDedup(docs, "doc_id", "text", 4, 2).count() == 2)
    assert(TextOps.spanDedup(empty, "doc_id", "text", 4, 2).count() == 0)
    // stratified sample at rate 0 keeps nothing; missing stratum uses default
    val d = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "src")
    assert(TextOps.stratifiedSample(d, "doc_id", "src",
      Seq("a" -> 0.0), defaultRate = 0.0).count() == 0)
    assert(TextOps.stratifiedSample(d, "doc_id", "src",
      Seq("a" -> 1.0), defaultRate = 1.0).count() == 2)
    // tfidf: empty corpus and all-empty docs yield empty, not errors
    assert(TextOps.tfidfTopTerms(empty, "doc_id", "text", 3, 1L).count() == 0)
    assert(TextOps.tfidfTopTerms(
      Seq((1L, " ")).toDF("doc_id", "text"), "doc_id", "text", 3, 1L).count() == 0)
    // contamination with an empty probe set is empty
    assert(TextOps.contaminationCheck(docs, "doc_id", "text",
      empty, "doc_id", "text", 2, 1L).count() == 0)
    // corpus diff of a table against itself is empty
    assert(TextOps.corpusDiff(docs, docs, "doc_id", "text").count() == 0)
    // hashing TF: empty/whitespace docs emit no rows; others normalized
    assert(TextOps.hashingTfSparse(docs, "doc_id", "text", 16)
      .filter($"doc_id" <= 2).count() == 0)
    // sessionization on empty input
    val emptyEv = Seq.empty[(Long, Timestamp, Double)].toDF("user_id", "ts", "value")
    assert(graft.operators.SessionOps.sessionSummaries(
      emptyEv, Seq("user_id"), "ts", "value", "30 minutes").count() == 0)
    assert(graft.operators.SessionOps.assignSessions(
      emptyEv, Seq("user_id"), "ts", 1800L).count() == 0)
    // BPE on a corpus with no repeatable pair learns nothing and still encodes
    val m = graft.functions.Bpe.train(
      Seq((1L, "x y z")).toDF("doc_id", "text"), "text", 8)
    assert(m.isEmpty)
    val enc = graft.functions.Bpe.tokenCounts(docs, "doc_id", "text", m)
      .as[(Long, Long)].collect().toMap
    assert(enc(1L) == 0L && enc(3L) == 3L && enc(4L) == 2L) // chars when no merges
    // compress_ratio on empty is 1.0 by convention (tested in TextVectorSpec)
  }

  test("round-4 ops survive empty/degenerate inputs") {
    import graft.operators.{DedupGroups, EventOps}
    val ev = Seq(
      (1L, 1L, "view", Timestamp.valueOf("2024-03-01 08:00:00"), 1.0)
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    val emptyEv = ev.filter($"user_id" < 0)
    // attribution with zero conversions (or empty input) is empty
    assert(EventOps.attribution(ev, "user_id", "event_type", "ts",
      "event_id", "value", "purchase", 1000000L).count() == 0)
    assert(EventOps.attribution(emptyEv, "user_id", "event_type", "ts",
      "event_id", "value", "purchase", 1000000L).count() == 0)
    // drift with every event in one period: d = na*0 - 0*Na = 0 and
    // den = n*Na*0 = 0 — no division anywhere, so no crash and no
    // flag (0 > 0 is false), which is the right read of "no B data"
    val dr = EventOps.driftChi2(ev, "event_type", "ts",
      "2024-06-01 00:00:00", 384L)
      .select($"n_a", $"n_b", $"drifted").as[(Long, Long, Boolean)].collect()
    assert(dr.toSeq == Seq((1L, 0L, false)))
    assert(EventOps.driftChi2(emptyEv, "event_type", "ts",
      "2024-06-01 00:00:00", 384L).count() == 0)
    // incremental CC: empty batch leaves standing labels untouched;
    // empty standing labels reduce to plain CC of the batch
    val standing = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "group_id")
    val noPairs = standing.filter($"doc_id" < 0)
      .toDF("doc_a", "doc_b")
    assert(DedupGroups.incrementalGroups(standing, noPairs)
      .as[(Long, Long)].collect().toMap == Map(1L -> 1L, 2L -> 1L))
    val noLabels = standing.filter($"doc_id" < 0)
    assert(DedupGroups.incrementalGroups(noLabels,
        Seq((5L, 6L)).toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap == Map(5L -> 5L, 6L -> 5L))
    // weighted sample: zero weight keeps nothing even at rate 1
    val docs = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "w")
    assert(TextOps.weightedSample(docs, "doc_id", $"w", 100L, 1.0).count() == 0)
    // indicators on a single row: bands collapse to the close, RSI null
    val one = Seq(("S", Timestamp.valueOf("2024-03-01 08:00:00"), 2.0))
      .toDF("sym", "bucket_ts", "close")
    val b = graft.operators.CandleOps
      .bollinger(one, Seq("sym"), "bucket_ts", "close", 2, 2)
      .select($"mid_cents", $"upper_cents", $"lower_cents")
      .as[(Double, Double, Double)].head()
    assert(b == ((200.0, 200.0, 200.0)))
    val r = graft.operators.CandleOps
      .rsi(one, Seq("sym"), "bucket_ts", "close", 2)
      .select($"rsi").as[Option[Double]].head()
    assert(r.isEmpty)
  }

  test("round-5 ops survive empty/degenerate inputs") {
    import graft.operators.{BasketOps, EventOps, SessionOps}
    val one = Seq(("S", ts("2024-03-01 08:00:00"), 2.0, 3.0, 1.0, 2.5, 4.0))
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "volume")
    val none = one.filter($"sym" === "missing")
    // single-candle indicators: flat stochastic is NULL (no 0/0), ATR
    // falls back to high-low, OBV starts at zero, pivot levels NULL
    val st = CandleOps.stochastic(one, Seq("sym"), "bucket_ts", 3, 2)
      .select($"k_raw", $"k_slow").as[(Option[Double], Option[Double])].head()
    assert(st._1.contains(75.0) && st._2.contains(75.0)) // den=200, num=150
    val flat = Seq(("S", ts("2024-03-01 08:00:00"), 2.0, 2.0, 2.0, 2.0, 4.0))
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "volume")
    val stFlat = CandleOps.stochastic(flat, Seq("sym"), "bucket_ts", 3, 2)
      .select($"k_raw", $"k_slow").as[(Option[Double], Option[Double])].head()
    assert(stFlat._1.isEmpty && stFlat._2.isEmpty)
    assert(CandleOps.atr(one, Seq("sym"), "bucket_ts", 3)
      .select($"tr_cents", $"atr_cents").as[(Long, Double)].head() == ((200L, 200.0)))
    assert(CandleOps.obv(one, Seq("sym"), "bucket_ts", "close", "volume")
      .select($"obv_cents").as[Long].head() == 0L)
    assert(CandleOps.pivotPoints(one, Seq("sym"), "bucket_ts")
      .select($"pivot").as[Option[Double]].head().isEmpty)
    assert(CandleOps.macd(one, Seq("sym"), "bucket_ts", "close", 2, 3, 2)
      .select($"macd_cents", $"signal_micro").as[(Double, Double)].head() == ((0.0, 0.0)))
    Seq(
      CandleOps.stochastic(none, Seq("sym"), "bucket_ts", 3, 2),
      CandleOps.atr(none, Seq("sym"), "bucket_ts", 3),
      CandleOps.donchian(none, Seq("sym"), "bucket_ts", 3),
      CandleOps.obv(none, Seq("sym"), "bucket_ts", "close", "volume"),
      CandleOps.macd(none, Seq("sym"), "bucket_ts", "close", 2, 3, 2),
      CandleOps.pivotPoints(none, Seq("sym"), "bucket_ts"),
      CandleOps.volumeProfile(none, Seq("sym"), "close", "volume", 100L)
    ).foreach(df => assert(df.count() == 0))
    // event analytics on empty input: empty frames, never errors
    val ev = Seq((1L, "view", ts("2024-03-01 08:00:00"), 1.0))
      .toDF("user_id", "event_type", "ts", "value")
    val emptyEv = ev.filter($"user_id" < 0)
    Seq(
      EventOps.rfm(emptyEv, "user_id", "ts", "value", $"event_type" === "purchase"),
      EventOps.powerCurve(emptyEv, "user_id"),
      EventOps.stickiness(emptyEv, "user_id", "ts"),
      EventOps.cohortLtv(emptyEv, "user_id", "ts", "value", $"event_type" === "purchase"),
      EventOps.seasonalityProfile(emptyEv, "event_type", "ts")
    ).foreach(df => assert(df.count() == 0))
    // a user with no purchases still gets an RFM row (monetary 0)
    val rf = EventOps.rfm(ev, "user_id", "ts", "value",
      $"event_type" === "purchase")
      .select($"monetary_cents", $"r_score").as[(Long, Long)].head()
    assert(rf == ((0L, 5L)))
    // cohortLtv with zero qualifying purchases is empty, not a crash
    assert(EventOps.cohortLtv(ev, "user_id", "ts", "value",
      $"event_type" === "purchase").count() == 0)
    // sessions: empty in, empty out
    val emptySessions = Seq.empty[(String, Long)].toDF("user_id", "n_events")
    assert(SessionOps.bounceRate(emptySessions, Seq("user_id")).count() == 0)
    assert(SessionOps.depthHistogram(emptySessions).count() == 0)
    // baskets of one item produce no pairs
    val solo = Seq((1L, 10L), (2L, 20L)).toDF("basket", "item")
    assert(BasketOps.coOccurrence(solo, "basket", "item", 10).count() == 0)
    // rarity on empty/whitespace docs: no token rows at all
    val blank = Seq((1L, "   "), (2L, "")).toDF("doc_id", "text")
    assert(TextOps.rarityScore(blank, "doc_id", "text").count() == 0)
  }

  test("multi-probe IVF with nprobe exceeding cluster count equals brute force within clusters") {
    import graft.functions.VectorOps
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 1), (2L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val cents = Seq((0, Array(1.0, 0.0)), (1, Array(0.0, 1.0))).toDF("cluster", "centroid")
    val all = VectorOps.knnTopKIvfProbe(
        vecs, "vec_id", "embedding", "label", cents, $"vec_id" === 0, k = 5, nprobe = 99)
      .select("neighbor_id").as[Long].collect().toSet
    assert(all == Set(1L, 2L)) // every non-query candidate reachable
  }

  test("round-5 drift/stats family survives empty and degenerate input") {
    import graft.operators.EventOps
    val emptyTyped = Seq.empty[(String, Timestamp, Option[Double], Long)]
      .toDF("event_type", "ts", "value", "user_id")
    assert(EventOps.driftKs(emptyTyped, "event_type", "ts", "value",
      "2024-01-16 00:00:00").count() == 0)
    assert(EventOps.statsDrift(emptyTyped, "event_type", "ts", "value",
      "user_id", "2024-01-16 00:00:00").count() == 0)
    assert(EventOps.burstiness(emptyTyped, "event_type", "ts").count() == 0)
    assert(EventOps.trimmedMean(emptyTyped, "event_type", "user_id",
      "value").count() == 0)
    // gini of an empty frame: the 1-row aggregate still emits, with
    // null gini (zero denominator), never a division error
    val g = EventOps.giniConcentration(
      Seq.empty[(Long, Double)].toDF("user_id", "value"), "user_id", "value")
      .select("n_users", "gini").as[(Long, Option[Double])].head()
    assert(g == ((0L, None)))
    // all-null values: KS has no sample -> empty; trimmed mean too
    val allNull = Seq(("t", ts("2024-01-10 00:00:00"), None: Option[Double], 1L),
      ("t", ts("2024-01-20 00:00:00"), None, 2L))
      .toDF("event_type", "ts", "value", "user_id")
    assert(EventOps.driftKs(allNull, "event_type", "ts", "value",
      "2024-01-16 00:00:00").count() == 0)
    assert(EventOps.trimmedMean(allNull, "event_type", "user_id",
      "value").count() == 0)
    // but the stats gate still reports the type: nulls ARE its signal
    val sd = EventOps.statsDrift(allNull, "event_type", "ts", "value",
      "user_id", "2024-01-16 00:00:00")
      .select("n_a", "null_a", "null_b").as[(Long, Long, Long)].head()
    assert(sd == ((1L, 1L, 1L)))
  }

  test("round-5 text/series additions survive empty and too-short input") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(TextOps.ngramNovelty(empty, "doc_id", "text", 3).count() == 0)
    assert(TextOps.bigramFluency(empty, "doc_id", "text").count() == 0)
    assert(TextOps.crossSourceOverlap(empty, "text").count() == 0)
    // docs too short for any shingle/bigram contribute no rows
    val short = Seq((1L, "word", "s1"), (2L, "", "s2"))
      .toDF("doc_id", "text", "source")
    assert(TextOps.ngramNovelty(short, "doc_id", "text", 3).count() == 0)
    assert(TextOps.bigramFluency(short, "doc_id", "text").count() == 0)
    // interpolation/autocorr/trend on empty rollups are empty
    val emptyRollup = Seq.empty[(String, Timestamp, Double)]
      .toDF("sym", "bucket_ts", "close")
    assert(CandleOps.resampleInterpolate(emptyRollup, Seq("sym"),
      "bucket_ts", "close", "1h").count() == 0)
    assert(CandleOps.autocorrelation(emptyRollup, Seq("sym"),
      "bucket_ts", "close").count() == 0)
    assert(CandleOps.trendSlope(emptyRollup, Seq("sym"), "bucket_ts",
      "close", "2024-01-01 00:00:00").count() == 0)
  }

  test("round-6 operators survive empty, degenerate, and singleton input") {
    import graft.operators.{EventOps, GraphOps, RankOps, SessionOps}
    // graph ops: empty edge set -> empty stats; a single edge -> two
    // degree-1 nodes, zero triangles; pagerank conserves positivity
    val noEdges = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(GraphOps.triangleStats(noEdges).count() == 0)
    assert(GraphOps.pagerankPinned(noEdges).count() == 0)
    val oneEdge = Seq((1L, 2L)).toDF("x", "y")
    val ts1 = GraphOps.triangleStats(oneEdge).collect()
    assert(ts1.length == 2 && ts1.forall(r => r.getLong(2) == 0L))
    val pr1 = GraphOps.pagerankPinned(oneEdge).collect()
    assert(pr1.length == 2 && pr1.forall(_.getLong(1) > 0L))
    // benford: all-null and zero values contribute nothing
    val z = Seq(("a", Option.empty[Double]), ("a", Some(0.0)), ("a", Some(0.004)))
      .toDF("event_type", "value")
    assert(EventOps.benfordDigits(z, "event_type", "value").count() == 0)
    // concentration on an empty frame is empty, single user -> hhi 1
    val one = Seq(("t", 7L), ("t", 7L)).toDF("event_type", "user_id")
    val c = EventOps.concentration(one, "event_type", "user_id").head()
    assert(c.getAs[Double]("hhi") == 1.0)
    // sweeps: empty sessions -> empty outputs; zero-length interval
    // coverage is zero but the block still counts
    val noSess = Seq.empty[(Timestamp, Timestamp)].toDF("s", "e")
    assert(SessionOps.peakConcurrency(noSess, "s", "e").count() == 0)
    assert(SessionOps.dailyCoverage(noSess, "s", "e").count() == 0)
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    val point = Seq((t0, t0)).toDF("s", "e")
    val cov = SessionOps.dailyCoverage(point, "s", "e").head()
    assert(cov.getAs[Long]("n_blocks") == 1L && cov.getAs[Long]("covered_us") == 0L)
    // pairwise estimators: a single observation yields no pairs
    val lone = Seq(("u", t0, 1.0)).toDF("sym", "bucket_ts", "close")
    assert(CandleOps.theilSen(lone, Seq("sym"), "bucket_ts", "close").count() == 0)
    assert(CandleOps.mannKendall(lone, Seq("sym"), "bucket_ts", "close").count() == 0)
    assert(CandleOps.runsTest(lone, Seq("sym"), "bucket_ts", "close").count() == 0)
    // weighted median: all weights non-positive -> group disappears
    val wz = Seq(("g", 5L, 0L, 1L)).toDF("src", "v", "w", "id")
    assert(RankOps.weightedMedian(wz, Seq("src"), "v", "w", "id").count() == 0)
  }

  test("round-6 session-2 operators survive empty, singleton, and degenerate input") {
    import graft.functions.TextOps
    import graft.operators.MicrostructureOps
    val emptyBars = Seq.empty[(String, Timestamp, Double, Double, Double, Double, Long, Double)]
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    val oneBar = Seq(("A", ts("2024-01-01 00:00:00"), 1.0, 2.0, 0.5, 1.5, 1L, 10.0))
      .toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume")
    // window indicators: empty in -> empty out; a single bar computes
    // from its one-element window without nulls exploding
    for (df <- Seq(
        MicrostructureOps.williamsR(emptyBars, Seq("sym"), "bucket_ts", 14),
        MicrostructureOps.aroon(emptyBars, Seq("sym"), "bucket_ts", 14),
        MicrostructureOps.mfi(emptyBars, Seq("sym"), "bucket_ts", 14),
        MicrostructureOps.cci(emptyBars, Seq("sym"), "bucket_ts", 20),
        MicrostructureOps.amihud(emptyBars, Seq("sym"), "bucket_ts"),
        MicrostructureOps.rollSpread(emptyBars, Seq("sym"), "bucket_ts"),
        MicrostructureOps.kyleLambda(emptyBars, Seq("sym"), "bucket_ts"),
        MicrostructureOps.olsSeasonalTrend(
          emptyBars, Seq("sym"), "bucket_ts", "2024-01-01 00:00:00"),
        MicrostructureOps.corrMatrix(emptyBars, "sym", "bucket_ts"),
        MicrostructureOps.leadLagCorr(
          emptyBars, "sym", "bucket_ts", col("sym") === "Z", 3)))
      assert(df.count() == 0)
    val a1 = MicrostructureOps.aroon(oneBar, Seq("sym"), "bucket_ts", 14).head()
    assert(a1.getAs[Long]("bars_since_high") == 0L &&
      a1.getAs[Double]("aroon_up") == 100.0)
    // a single bar has no move: the move-based reports drop it
    assert(MicrostructureOps.rollSpread(oneBar, Seq("sym"), "bucket_ts").count() == 0)
    assert(MicrostructureOps.kyleLambda(oneBar, Seq("sym"), "bucket_ts").count() == 0)
    assert(MicrostructureOps.amihud(oneBar, Seq("sym"), "bucket_ts").count() == 0)
    // a 2-bar key: one move, zero pairs -> rollSpread still empty,
    // kyleLambda emits a singular (NULL) fit rather than dividing by 0
    val twoBars = oneBar.unionByName(
      Seq(("A", ts("2024-01-01 01:00:00"), 1.0, 2.0, 0.5, 2.5, 1L, 10.0))
        .toDF("sym", "bucket_ts", "open", "high", "low", "close", "trades", "volume"))
    assert(MicrostructureOps.rollSpread(twoBars, Seq("sym"), "bucket_ts").count() == 0)
    val kl = MicrostructureOps.kyleLambda(twoBars, Seq("sym"), "bucket_ts").head()
    assert(kl.getAs[Long]("n_moves") == 1L &&
      kl.isNullAt(kl.fieldIndex("kyle_lambda")))
    // text ops: empty corpus and an all-stopword doc produce no
    // phrases/edges but never throw
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.rakeKeywords(noDocs, "doc_id", "text", 5).count() == 0)
    assert(TextOps.textrankKeywords(noDocs, "doc_id", "text", 5).count() == 0)
    assert(TextOps.readability(noDocs, "doc_id", "text").count() == 0)
    val allStop = Seq((1L, "the and of to in is a")).toDF("doc_id", "text")
    assert(TextOps.rakeKeywords(allStop, "doc_id", "text", 5).count() == 0)
    assert(TextOps.textrankKeywords(allStop, "doc_id", "text", 5).count() == 0)
  }

  test("moment stats survive >$30M values (squared-cents DECIMAL(38,0) pre-cast pin)") {
    // cents(5e7 dollars) = 5e9; squared = 2.5e19 > Long.MaxValue
    // (9.22e18). Without the DecimalType(38,0) pre-cast on one operand
    // (8f807fc), non-ANSI Spark wraps the Long product SILENTLY and
    // these drift off by orders of magnitude — this test goes red if
    // that cast is ever reverted.
    val dir = java.nio.file.Files.createTempDirectory("graft_overflow").toString
    Seq(("A", 50000000.00), ("A", 50000002.00))
      .toDF("l_returnflag", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val ps = SparkEntry.queries("q_price_stats")(spark, dir).head()
    assert(ps.getAs[Double]("avg_price") == 50000001.0)
    // true stddev of {50e6, 50e6+2} is sqrt(2) dollars; wrapped Long
    // math lands at NaN/garbage, never in this +-2-micro band
    val micros = ps.getAs[Long]("stddev_price_micros")
    assert(micros >= 1414212L && micros <= 1414215L,
      s"stddev_price_micros=$micros, expected ~sqrt(2)*1e6")

    Seq((1L, ts("2024-01-01 00:00:00"), 1L, "purchase", 40000000.00),
        (2L, ts("2024-01-01 00:01:00"), 2L, "purchase", 50000000.00))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    // variant assignment is hash-determined; the overflow check is on
    // the corpus total: (4e9^2 + 5e9^2) / 1e4 = 4.1e15 dollars^2
    val sq = SparkEntry.queries("q_ab_metrics")(spark, dir)
      .agg(sum($"total_value_sq")).head().getDouble(0)
    assert(math.abs(sq - 4.1e15) < 1.0,
      s"total_value_sq sum=$sq, expected 4.1e15 — Long square wrapped?")
  }
}
