package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.streaming.AsOfStream
import graft.streaming.AsOfStream.{AsOfPair, Tick}

/** Streaming backward as-of: every sealed left emits exactly once with
  * the prevailing right (or null), equal to the batch AsOfJoin over
  * the same events regardless of micro-batch slicing, out-of-order
  * arrival inside the watermark, and tolerance settings.
  */
class AsOfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // trades (lefts) and quotes (rights) over two keys; includes a trade
  // BEFORE any quote (null match) and long gaps (staleness cases)
  private val quotes = Seq(
    Tick("A", ts("2024-03-01 08:00:05"), 10.0),
    Tick("A", ts("2024-03-01 08:00:20"), 11.0),
    Tick("A", ts("2024-03-01 08:03:00"), 12.0),
    Tick("B", ts("2024-03-01 08:00:30"), 50.0))
  private val trades = Seq(
    Tick("A", ts("2024-03-01 08:00:02"), 1.0), // before any quote -> null
    Tick("A", ts("2024-03-01 08:00:20"), 2.0), // equal ts -> inclusive match 11.0
    Tick("A", ts("2024-03-01 08:02:00"), 3.0), // prevails 11.0 (stale 100s)
    Tick("A", ts("2024-03-01 08:03:30"), 4.0), // prevails 12.0
    Tick("B", ts("2024-03-01 08:05:00"), 5.0)) // prevails 50.0 (stale 270s)

  private def runStream(
      slices: Seq[(Seq[Tick], Seq[Tick])],
      tolMs: Option[Long],
      name: String
  ): Map[(String, Timestamp), AsOfPair] = {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[Tick]
    val rs = MemoryStream[Tick]
    val joined = AsOfStream.asofBackward(ls.toDS(), rs.toDS(), "30 seconds", tolMs)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      slices.foreach { case (l, r) =>
        if (l.nonEmpty) ls.addData(l)
        if (r.nonEmpty) rs.addData(r)
        q.processAllAvailable()
      }
      // flush: advance the watermark far past everything, then one more
      // empty trigger so event-time timeouts fire
      rs.addData(Tick("flush", ts("2024-03-01 10:00:00"), 0.0))
      q.processAllAvailable()
      rs.addData(Tick("flush", ts("2024-03-01 10:30:00"), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[AsOfPair].collect()
      .filter(_.key != "flush")
      .map(p => (p.key, p.ts_l) -> p).toMap
  }

  private def batchExpected(tolMs: Option[Long]): Map[(String, Timestamp), (Option[Timestamp], Option[Double])] =
    AsOfJoin.asof(
        trades.toDF("key", "ts", "value"),
        quotes.toDF("key", "ts", "value"),
        Seq("key"), "ts", Seq("value"), Seq("value"),
        toleranceUs = tolMs.map(_ * 1000))
      .select(col("key"), col("ts"), col("asof_value"))
      .collect()
      .map { r =>
        val v = if (r.isNullAt(2)) None else Some(r.getDouble(2))
        (r.getString(0), r.getTimestamp(1)) -> (None: Option[Timestamp], v)
      }.toMap

  test("stream == batch: no tolerance, across uneven micro-batch slicings with out-of-order rows") {
    val slices = Seq(
      // quotes arrive after some trades inside the same watermark
      (trades.take(2), Seq(quotes(1))),
      (Seq(trades(2)), Seq(quotes(0), quotes(3))), // 08:00:05 quote arrives late
      (trades.drop(3), quotes.drop(2).take(1)))
    val got = runStream(slices, None, "asof_stream_plain")
    val want = batchExpected(None)
    assert(got.size == trades.size, s"every trade emits exactly once: $got")
    want.foreach { case (k, (_, wv)) =>
      assert(got(k).asof_value == wv, s"$k: got ${got(k).asof_value}, want $wv")
    }
    // the null-match and equal-ts-inclusive cases specifically
    assert(got(("A", ts("2024-03-01 08:00:02"))).asof_value.isEmpty)
    assert(got(("A", ts("2024-03-01 08:00:20"))).asof_value.contains(11.0))
  }

  test("forward stream == batch: earliest following quote within tolerance, null past horizon") {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[Tick]
    val rs = MemoryStream[Tick]
    val joined = AsOfStream.asofForward(ls.toDS(), rs.toDS(), "30 seconds",
      toleranceMs = 60000L)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("asof_stream_fwd").start()
    try {
      ls.addData(trades)
      rs.addData(quotes)
      q.processAllAvailable()
      rs.addData(Tick("flush", ts("2024-03-01 10:00:00"), 0.0))
      q.processAllAvailable()
      rs.addData(Tick("flush", ts("2024-03-01 10:30:00"), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof_stream_fwd").as[AsOfPair].collect()
      .filter(_.key != "flush").map(p => (p.key, p.ts_l) -> p.asof_value).toMap
    val want = AsOfJoin.asofForward(
        trades.toDF("key", "ts", "value"), quotes.toDF("key", "ts", "value"),
        Seq("key"), "ts", Seq("value"), Seq("value"),
        toleranceUs = Some(60000000L))
      .select(col("key"), col("ts"), col("asof_value")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.size == trades.size)
    want.foreach { case (k, wv) => assert(got(k) == wv, s"$k: got ${got(k)}, want $wv") }
    // the 08:00:02 trade's NEXT quote (08:00:05) is 3s ahead -> 10.0
    assert(got(("A", ts("2024-03-01 08:00:02"))).contains(10.0))
    // equal ts matches forward too
    assert(got(("A", ts("2024-03-01 08:00:20"))).contains(11.0))
    // 08:02:00 trade: next quote 08:03:00 is 60s ahead == tolerance -> match
    assert(got(("A", ts("2024-03-01 08:02:00"))).contains(12.0))
    // B's 08:05:00 trade has no following quote -> null
    assert(got(("B", ts("2024-03-01 08:05:00"))).isEmpty)
  }

  test("randomized: stream == batch for both directions across random slicings") {
    val rnd = new scala.util.Random(42)
    val keys = Seq("K1", "K2", "K3")
    val base = ts("2024-03-01 08:00:00").getTime
    def randTicks(n: Int, seed: Int): Seq[Tick] = {
      val r = new scala.util.Random(seed)
      // distinct per-key second offsets -> unique (key, ts): tie-break
      // determinism between the window and state forms is not under test
      keys.flatMap { k =>
        r.shuffle((0 until 600).toList).take(n).map { s =>
          Tick(k, new Timestamp(base + s * 1000L), r.nextInt(1000) / 10.0)
        }
      }
    }
    val lts = randTicks(25, 1)
    val rts = randTicks(40, 2)
    // slices must respect watermark progression (later batches cannot
    // carry rows older than watermark or they are LEGITIMATELY dropped
    // late): cut the GLOBAL timeline into 4 contiguous ranges, shuffle
    // order only within each slice — out-of-order inside the watermark
    // delay, which is exactly the operator's contract
    def slices(xs: Seq[Tick], seed: Int): Seq[Seq[Tick]] = {
      val r = new scala.util.Random(seed)
      (0 until 4).map { i =>
        val (lo, hi) = (base + i * 150000L, base + (i + 1) * 150000L)
        r.shuffle(xs.filter(t => t.ts.getTime >= lo && t.ts.getTime < hi))
      }
    }
    val sliceSeq = slices(lts, 3).zip(slices(rts, 4))

    def batchWant(dir: String, tolMs: Option[Long]) = {
      val (l, r) = (lts.toDF("key", "ts", "value"), rts.toDF("key", "ts", "value"))
      val tol = tolMs.map(_ * 1000)
      val df = dir match {
        case "fwd" => AsOfJoin.asofForward(l, r, Seq("key"), "ts",
          Seq("value"), Seq("value"), toleranceUs = tol)
        case "near" => AsOfJoin.asofNearest(l, r, Seq("key"), "ts",
          Seq("value"), Seq("value"), toleranceUs = tol)
        case _ => AsOfJoin.asof(l, r, Seq("key"), "ts",
          Seq("value"), Seq("value"), toleranceUs = tol)
      }
      df.select(col("key"), col("ts"), col("asof_value")).collect()
        .map(r => (r.getString(0), r.getTimestamp(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    }

    def streamGot(dir: String, tolMs: Option[Long], name: String) = {
      implicit val sqlCtx = spark.sqlContext
      val ls = MemoryStream[Tick]
      val rs = MemoryStream[Tick]
      val joined = dir match {
        case "fwd" => AsOfStream.asofForward(ls.toDS(), rs.toDS(), "45 seconds", tolMs.get)
        case "near" => AsOfStream.asofNearest(ls.toDS(), rs.toDS(), "45 seconds", tolMs.get)
        case _ => AsOfStream.asofBackward(ls.toDS(), rs.toDS(), "45 seconds", tolMs)
      }
      val q = joined.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        sliceSeq.foreach { case (l, r) =>
          if (l.nonEmpty) ls.addData(l)
          if (r.nonEmpty) rs.addData(r)
          q.processAllAvailable()
        }
        rs.addData(Tick("flush", ts("2024-03-01 12:00:00"), 0.0))
        q.processAllAvailable()
        rs.addData(Tick("flush", ts("2024-03-01 13:00:00"), 0.0))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).as[AsOfPair].collect().filter(_.key != "flush")
        .map(p => (p.key, p.ts_l) -> p.asof_value).toMap
    }

    for ((dir, tol, name) <- Seq(
        ("back", None, "asof_rand_b"),
        ("back", Some(90000L), "asof_rand_bt"),
        ("fwd", Some(90000L), "asof_rand_f"),
        ("near", Some(90000L), "asof_rand_n"))) {
      val got = streamGot(dir, tol, name)
      val want = batchWant(dir, tol)
      assert(got.size == lts.size, s"$name: ${got.size} emitted of ${lts.size}")
      want.foreach { case (k, wv) =>
        assert(got(k) == wv, s"$name $k: got ${got(k)}, want $wv")
      }
    }
  }

  test("stream == batch: 60s tolerance nulls stale matches") {
    val slices = Seq((trades, quotes))
    val got = runStream(slices, Some(60000L), "asof_stream_tol")
    val want = batchExpected(Some(60000L))
    assert(got.size == trades.size)
    want.foreach { case (k, (_, wv)) =>
      assert(got(k).asof_value == wv, s"$k: got ${got(k).asof_value}, want $wv")
    }
    // staleness: the 08:02:00 trade's only candidate is 100s old -> null
    assert(got(("A", ts("2024-03-01 08:02:00"))).asof_value.isEmpty)
    // B's 270s-old quote likewise
    assert(got(("B", ts("2024-03-01 08:05:00"))).asof_value.isEmpty)
  }
}
