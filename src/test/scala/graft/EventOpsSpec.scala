package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{EntityOps, EventOps}

/** Event-sequence analytics: funnel chain semantics (order, window,
  * anchor), retention offsets, sequence-match determinism under
  * repartitioning, exact k-sigma boundary behavior, and the blocked
  * fuzzy matcher's recall/cap contract.
  */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val H = 3600000000L // one hour in microseconds

  private lazy val funnelEvents = Seq(
    // u1: full chain inside a 2h window -> level 3
    (1L, "view", ts("2024-03-01 08:00:00")),
    (1L, "click", ts("2024-03-01 08:30:00")),
    (1L, "purchase", ts("2024-03-01 09:30:00")),
    // u2: purchase lands outside the 2h window -> level 2
    (2L, "view", ts("2024-03-01 08:00:00")),
    (2L, "click", ts("2024-03-01 08:10:00")),
    (2L, "purchase", ts("2024-03-01 10:00:01")),
    // u3: click BEFORE the first view -> chain stops at level 1
    (3L, "click", ts("2024-03-01 07:00:00")),
    (3L, "view", ts("2024-03-01 08:00:00")),
    // u4: never views -> level 0, appears in no step row
    (4L, "purchase", ts("2024-03-01 08:00:00")),
    // u5: anchor is the EARLIEST view; the second view cannot re-anchor
    (5L, "view", ts("2024-03-01 00:00:00")),
    (5L, "view", ts("2024-03-01 09:00:00")),
    (5L, "click", ts("2024-03-01 09:10:00"))
  ).toDF("user_id", "event_type", "ts")

  test("funnelSteps: order, window, and earliest-view anchoring") {
    val got = EventOps
      .funnelSteps(funnelEvents, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowUs = 2 * H)
      .as[(Int, String, Long)].collect().sortBy(_._1)
    // u1,u2,u3,u5 viewed; u1,u2 clicked in-window after the view
    // (u5's click is 9h after its anchor); u1 purchased in-window.
    assert(got.toSeq == Seq(
      (1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnelSteps is invariant to input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) = EventOps
      .funnelSteps(df, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowUs = 2 * H)
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(run(funnelEvents.repartition(7)) == run(funnelEvents.coalesce(1)))
  }

  test("retentionCohorts: first-touch cohort x day offset") {
    val ev = Seq(
      (1L, ts("2024-03-01 10:00:00")), (1L, ts("2024-03-01 23:00:00")),
      (1L, ts("2024-03-03 10:00:00")),
      (2L, ts("2024-03-01 09:00:00")), (2L, ts("2024-03-02 09:00:00")),
      (3L, ts("2024-03-02 12:00:00"))
    ).toDF("user_id", "ts")
    val got = EventOps.retentionCohorts(ev, "user_id", "ts")
      .select(col("cohort_date").cast("string"), col("day_offset"), col("n_users"))
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      ("2024-03-01", 0L, 2L), // u1, u2 on their first day
      ("2024-03-01", 1L, 1L), // u2 back next day
      ("2024-03-01", 2L, 1L), // u1 back on day 2
      ("2024-03-02", 0L, 1L)  // u3's cohort
    ))
  }

  test("sequenceMatch: (ts, id) ordering and find-anywhere regex") {
    val ev = Seq(
      // u1: same-ts tie broken by event_id -> "vep" (error between) no match
      (1L, 10L, "view", ts("2024-03-01 08:00:00")),
      (1L, 11L, "error", ts("2024-03-01 08:00:00")),
      (1L, 12L, "purchase", ts("2024-03-01 09:00:00")),
      // u2: "svp" matches v[^e]*p mid-string
      (2L, 20L, "signup", ts("2024-03-01 08:00:00")),
      (2L, 21L, "view", ts("2024-03-01 08:05:00")),
      (2L, 22L, "purchase", ts("2024-03-01 08:10:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = EventOps
      .sequenceMatch(ev.repartition(5), "user_id", "event_type", "ts",
        "event_id", "v[^e]*p")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, false), (2L, 3L, true)))
  }

  test("sigmaOutliers: strict inequality at the exact k-sigma boundary") {
    // cents {100, 300}: mu=200, sigma=100 -> both are EXACTLY 1 sigma
    // away; strict > must flag neither at k=1.
    val boundary = Seq(("a", 1L, 1.00), ("a", 2L, 3.00))
      .toDF("grp", "id", "value")
    assert(EventOps.sigmaOutliers(boundary, "grp", "value", k = 1).count() == 0)

    // one planted spike among flat values is >3 sigma out
    val flat = (1L to 99L).map(i => ("b", i, 5.00)) :+ (("b", 100L, 500.00))
    val got = EventOps
      .sigmaOutliers(flat.toDF("grp", "id", "value"), "grp", "value", k = 3)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(100L))
  }

  test("funnelSteps matches a naive per-user reference on random streams") {
    val steps = Seq("view", "click", "purchase")
    val types = Vector("view", "click", "purchase", "error", "signup")
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val base = ts("2024-03-01 08:00:00").getTime
      val events = (1 to 500).map { _ =>
        (rnd.nextInt(10).toLong, types(rnd.nextInt(types.size)),
          new Timestamp(base + rnd.nextInt(20000) * 1000L))
      }
      // naive greedy, one user at a time, plain Scala
      val levels = events.groupBy(_._1).map { case (u, evs) =>
        val t1s = evs.filter(_._2 == steps.head).map(_._3.getTime)
        if (t1s.isEmpty) u -> 0
        else {
          val anchor = t1s.min
          var prev = anchor
          var lvl = 1
          var go = true
          for (s <- steps.tail if go) {
            val cand = evs.filter(e => e._2 == s && e._3.getTime > prev &&
              e._3.getTime <= anchor + 2 * H / 1000).map(_._3.getTime)
            if (cand.isEmpty) go = false else { prev = cand.min; lvl += 1 }
          }
          u -> lvl
        }
      }
      val expect = (1 to steps.size)
        .map(s => s -> levels.count(_._2 >= s).toLong)
        .filter(_._2 > 0).toMap
      val got = EventOps
        .funnelSteps(events.toDF("user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", steps, windowUs = 2 * H)
        .as[(Int, String, Long)].collect().map(r => r._1 -> r._3).toMap
      assert(got == expect, s"seed=$seed")
    }
  }

  test("funnelSteps plans ONE exchange: all window minima share it") {
    val plan = EventOps
      .funnelSteps(funnelEvents, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowUs = 2 * H)
      .queryExecution.executedPlan.toString
    // the event side is shuffled exactly once (user key); the only
    // other exchange is the final 4-row step aggregation, and the step
    // dimension arrives by broadcast
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges:\n$plan")
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("sequenceMatch matches a naive reference on random streams") {
    val types = Vector("view", "click", "purchase", "error", "signup")
    val rnd = new scala.util.Random(9)
    val base = ts("2024-03-01 08:00:00").getTime
    val events = (1 to 400).map { i =>
      (rnd.nextInt(12).toLong, i.toLong, types(rnd.nextInt(types.size)),
        new Timestamp(base + rnd.nextInt(5000) * 1000L))
    }
    val pattern = "v[^e]*p"
    val expect = events.groupBy(_._1).map { case (u, evs) =>
      val seq = evs.sortBy(e => (e._4.getTime, e._2))
        .map(_._3.charAt(0)).mkString
      u -> (evs.size.toLong, pattern.r.findFirstIn(seq).isDefined)
    }
    val got = EventOps
      .sequenceMatch(events.toDF("user_id", "event_id", "event_type", "ts")
        .repartition(7), "user_id", "event_type", "ts", "event_id", pattern)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect)
  }

  test("sessionize-then-funnel reuses the user exchange: one shuffle") {
    val sess = graft.operators.SessionOps.assignSessions(
      funnelEvents, Seq("user_id"), "ts", gapSeconds = 3600L)
    val levels = EventOps.funnelLevelsByKey(sess,
      Seq("user_id", "session_n"), "event_type", "ts",
      Seq("view", "click", "purchase"), windowUs = 2 * H)
    val plan = levels.queryExecution.executedPlan.toString
    // hash-partitioning on user co-locates (user, session_n) groups,
    // so the funnel windows and the final aggregate all consume the
    // sessionizer's single exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("rollingSigmaOutliers: drifting baseline flags only the spike") {
    // key "a": 60 flat values then a spike; the rolling window judges
    // the spike against the trailing 50 -> flagged. A later value at
    // the old spike level is NOT flagged once the window has drifted
    // to include the spike... but here values return to flat, so only
    // the spike trips.
    val rows = (1 to 60).map(i => ("a", i.toLong, ts("2024-03-01 08:00:00"), 5.00)) ++
      Seq(("a", 61L, ts("2024-03-01 09:00:00"), 500.00)) ++
      (62 to 70).map(i => ("a", i.toLong, ts("2024-03-01 10:00:00"), 5.00))
    val got = EventOps
      .rollingSigmaOutliers(rows.toDF("k", "id", "ts", "value"),
        "k", "ts", "id", "value", windowRows = 50, k = 3)
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(61L))
  }

  test("rollingSigmaOutliers is invariant to input partitioning") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 400).map { i =>
      (s"k${i % 3}", i.toLong, ts("2024-03-01 08:00:00"),
        if (rnd.nextInt(40) == 0) 900.00 else rnd.nextInt(1000) / 100.0)
    }
    def run(np: Int) = EventOps
      .rollingSigmaOutliers(rows.toDF("k", "id", "ts", "value").repartition(np),
        "k", "ts", "id", "value", windowRows = 20, k = 3)
      .select("id").as[Long].collect().toSeq.sorted
    assert(run(1) == run(13))
  }

  test("funnelLatency: per-step time-to-convert from the same chain") {
    val got = EventOps
      .funnelLatency(funnelEvents, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowUs = 2 * H)
      .select("step", "n_users", "min_us", "max_us")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // click latencies: u1 30min, u2 10min -> min 10min, max 30min;
    // purchase: u1 only, 90min
    assert(got == Seq(
      (2, 2L, 600000000L, 1800000000L),
      (3, 1L, 5400000000L, 5400000000L)))
  }

  test("eventPaths: trigrams in (ts,id) order, deterministic top-k cut") {
    val ev = Seq(
      (1L, 1L, "view", ts("2024-03-01 08:00:00")),
      (1L, 2L, "click", ts("2024-03-01 08:01:00")),
      (1L, 3L, "purchase", ts("2024-03-01 08:02:00")),
      (1L, 4L, "view", ts("2024-03-01 08:03:00")),
      (2L, 5L, "view", ts("2024-03-01 08:00:00")),
      (2L, 6L, "click", ts("2024-03-01 08:01:00")),
      (2L, 7L, "purchase", ts("2024-03-01 08:02:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = EventOps
      .eventPaths(ev, "user_id", "event_type", "ts", "event_id", k = 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("view>click>purchase", 2L),       // both users
      ("click>purchase>view", 1L)))      // u1 only; ties broke on path
  }

  test("interArrivalHistogram: exact log2 buckets incl. zero gaps") {
    val base = ts("2024-03-01 08:00:00").getTime
    val ev = Seq(
      // gaps in seconds: 1 (2^0*1e6 us -> bucket 19), 2 (bucket 20),
      // and a 0-gap tie broken by id -> bucket -1
      ("a", 1L, new Timestamp(base)),
      ("a", 2L, new Timestamp(base + 1000)),
      ("a", 3L, new Timestamp(base + 3000)),
      ("a", 4L, new Timestamp(base + 3000))
    ).toDF("grp", "id", "ts")
    val got = EventOps.interArrivalHistogram(ev, "grp", "ts", "id")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._2)
    // 1000 ms = 1e6 us: bin length 20 -> bucket 19; 2000 ms -> 20
    assert(got == Seq(("a", -1L, 1L), ("a", 19L, 1L), ("a", 20L, 1L)))
  }

  test("madOutliers: spike flagged; thresholds robust to the spike") {
    // 99 values uniform-ish around 10, one spike at 500: median and
    // MAD ignore the spike entirely, so it flags; a mild excursion
    // (13) does not
    val rows = (1L to 99L).map(i => ("g", i, 9.0 + (i % 5))) :+ (("g", 100L, 500.00))
    val got = EventOps
      .madOutliers(rows.toDF("grp", "id", "value"), "grp", "value", k = 5.0)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(100L))
  }

  test("userLifecycle: new / retained / resurrected / churning") {
    val ev = Seq(
      // u1: weeks 1,2,4 -> new, retained(+churning), resurrected(+churning)
      (1L, ts("2024-03-04 10:00:00")), (1L, ts("2024-03-12 10:00:00")),
      (1L, ts("2024-03-26 10:00:00")),
      // u2: week 1 only -> new + churning
      (2L, ts("2024-03-05 10:00:00"))
    ).toDF("user_id", "ts")
    val got = EventOps.userLifecycle(ev, "user_id", "ts")
      .select(col("week_start").cast("string"), col("n_new"),
        col("n_retained"), col("n_resurrected"), col("n_churning"))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("2024-03-04", 2L, 0L, 0L, 1L), // u1+u2 new; u2 churns
      ("2024-03-11", 0L, 1L, 0L, 1L), // u1 retained, then gap -> churning
      ("2024-03-25", 0L, 0L, 1L, 1L)  // u1 resurrected; last week churns
    ))
  }

  test("fuzzyNamePairs: blocking recall, threshold, and bucket cap") {
    val names = Seq(
      "cold bolt", "old bolt",   // share last token, dist 1
      "old ring", "old rings",   // share first token, dist 1
      "red widget",              // no partner
      "axx yzz", "bxx wzz"       // dist 2 but share NEITHER token: missed by design
    ).map(Tuple1(_)).toDF("p_name")
    val got = EntityOps.fuzzyNamePairs(names, "p_name", maxDist = 2)
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      ("cold bolt", "old bolt", 1L),
      ("old ring", "old rings", 1L)))

    // cap: every name shares last token "x" -> block of 4 over cap 3 drops
    val hot = Seq("aa x", "ab x", "ac x", "ad x").map(Tuple1(_)).toDF("p_name")
    assert(EntityOps.fuzzyNamePairs(hot, "p_name", maxDist = 2, bucketCap = 3)
      .count() == 0)
    // first-token blocks (size 1 each) survive but match nothing <= dist
    assert(EntityOps.fuzzyNamePairs(hot, "p_name", maxDist = 3, bucketCap = 10)
      .count() == 6)
  }

  private lazy val attrEvents = Seq(
    // u1 epoch 0: ad -> email -> ad, converts for 10.00
    (1L, 101L, "ad", ts("2024-03-01 08:00:00"), null.asInstanceOf[java.lang.Double]),
    (1L, 102L, "email", ts("2024-03-01 09:00:00"), null.asInstanceOf[java.lang.Double]),
    (1L, 103L, "ad", ts("2024-03-01 10:00:00"), null.asInstanceOf[java.lang.Double]),
    (1L, 104L, "buy", ts("2024-03-01 11:00:00"), java.lang.Double.valueOf(10.0)),
    // u1 epoch 1: single email touch, converts for 6.00
    (1L, 105L, "email", ts("2024-03-02 08:00:00"), null.asInstanceOf[java.lang.Double]),
    (1L, 106L, "buy", ts("2024-03-02 09:00:00"), java.lang.Double.valueOf(6.0)),
    // u2: touch with NO later conversion -> no credit
    (2L, 201L, "ad", ts("2024-03-01 08:00:00"), null.asInstanceOf[java.lang.Double]),
    // u3: touch outside the lookback -> excluded from its epoch
    (3L, 301L, "ad", ts("2024-02-01 08:00:00"), null.asInstanceOf[java.lang.Double]),
    (3L, 302L, "email", ts("2024-03-01 08:00:00"), null.asInstanceOf[java.lang.Double]),
    (3L, 303L, "buy", ts("2024-03-01 09:00:00"), java.lang.Double.valueOf(3.0))
  ).toDF("user_id", "event_id", "event_type", "ts", "value")

  test("attribution: first/last/linear credit per channel, exact") {
    val got = EventOps.attribution(attrEvents, "user_id", "event_type", "ts",
      "event_id", "value", convType = "buy", lookbackUs = 7L * 24 * H)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // u1 epoch 0 (1000 cents over ad,email,ad): first=ad, last=ad,
    //   linear 333333 micro-cents each (1000*1e6 div 3).
    // u1 epoch 1 (600 cents over email): email gets everything.
    // u3 (300 cents): only the in-lookback email touch counts.
    assert(got == Seq(
      ("ad", 2L, 1L, 1000L, 1L, 1000L, 2L * 333333333L),
      ("email", 3L, 2L, 900L, 2L, 900L,
        333333333L + 600000000L + 300000000L)))
  }

  test("attribution plan: events shuffle once for epochs, once for the epoch join") {
    val plan = EventOps.attribution(attrEvents, "user_id", "event_type", "ts",
      "event_id", "value", convType = "buy", lookbackUs = 7L * 24 * H)
      .queryExecution.executedPlan.toString
    // user-sort window (1), touches+convs re-keyed on (user, epoch)
    // for the join/windows (2 — one per side), final channel
    // aggregate (1); nothing else may shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 4, s"expected <=4 hash exchanges, got $exchanges:\n$plan")
  }

  test("attribution is invariant to input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      EventOps.attribution(df, "user_id", "event_type", "ts", "event_id",
        "value", convType = "buy", lookbackUs = 7L * 24 * H)
        .as[(String, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    assert(run(attrEvents.repartition(7)) == run(attrEvents.coalesce(1)))
  }

  test("driftChi2: planted mix shift flags only the shifted type") {
    // 'a' period: 40/40; 'b' period: x stays 40, y collapses to 5
    val rows =
      (1 to 40).map(i => (s"e$i", "x", ts("2024-03-01 08:00:00"))) ++
        (1 to 40).map(i => (s"f$i", "y", ts("2024-03-01 08:00:00"))) ++
        (1 to 40).map(i => (s"g$i", "x", ts("2024-03-03 08:00:00"))) ++
        (1 to 5).map(i => (s"h$i", "y", ts("2024-03-03 08:00:00")))
    val df = rows.toDF("event_id", "event_type", "ts")
    val got = EventOps.driftChi2(df, "event_type", "ts",
      splitTs = "2024-03-02 00:00:00", threshold100 = 384L)
      .select(col("event_type"), col("n_a"), col("n_b"), col("drifted"))
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // x: d = 40*45 - 40*80 = -1400, num = 1.96e6*... vs den: drifted
    // both rows flag — with TWO types the 2x2 table is symmetric, so
    // plant a third stable type to isolate the shifted one
    val rows3 = rows ++ (1 to 40).map(i => (s"k$i", "z", ts("2024-03-01 08:00:00"))) ++
      (1 to 40).map(i => (s"l$i", "z", ts("2024-03-03 08:00:00")))
    val got3 = EventOps.driftChi2(rows3.toDF("event_id", "event_type", "ts"),
      "event_type", "ts", splitTs = "2024-03-02 00:00:00", threshold100 = 384L)
      .select(col("event_type"), col("drifted"))
      .as[(String, Boolean)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("x", "y"))
    assert(got(0) == ("x", 40L, 40L, true) && got(1) == ("y", 40L, 5L, true))
    assert(got3 == Seq(("x", false), ("y", true), ("z", false)))
  }

  test("markovTransitions: adjacency counts and exact-ratio probabilities") {
    val ev = Seq(
      (1L, 1L, "a", ts("2024-03-01 08:00:00")),
      (1L, 2L, "b", ts("2024-03-01 08:01:00")),
      (1L, 3L, "a", ts("2024-03-01 08:02:00")),
      (1L, 4L, "c", ts("2024-03-01 08:03:00")),
      (2L, 5L, "a", ts("2024-03-01 08:00:00")),
      (2L, 6L, "b", ts("2024-03-01 08:01:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = EventOps.markovTransitions(ev, "user_id", "event_type", "ts",
      "event_id").as[(String, String, Long, Long, Double)]
      .collect().sortBy(t => (t._1, t._2)).toSeq
    // from a: ->b twice, ->c once; from b: ->a once (u2's b is terminal)
    assert(got == Seq(
      ("a", "b", 2L, 3L, 2.0 / 3.0),
      ("a", "c", 1L, 3L, 1.0 / 3.0),
      ("b", "a", 1L, 1L, 1.0)))
  }

  test("streamingDriftChi2: per-window goodness-of-fit vs declared mix") {
    // expected 1:1 x/y; window 1 balanced (no flag), window 2 all-x
    val rows =
      (1 to 30).map(i => (s"a$i", if (i % 2 == 0) "x" else "y",
        ts("2024-03-01 08:05:00"))) ++
        (1 to 30).map(i => (s"b$i", "x", ts("2024-03-01 09:05:00"))) ++
        Seq(("z1", "other", ts("2024-03-01 09:06:00"))) // undeclared: ignored
    val batch = rows.toDF("event_id", "event_type", "ts")
    val got = EventOps.streamingDriftChi2(batch, "event_type", "ts",
      windowLen = "1 hour", watermark = "1 minute",
      expected = Seq("x" -> 1L, "y" -> 1L), threshold100 = 384L)
      .as[(Timestamp, String, Long, Long, Boolean)]
      .collect().sortBy(t => (t._1.getTime, t._2)).toSeq
    assert(got == Seq(
      (ts("2024-03-01 08:00:00"), "x", 15L, 30L, false),
      (ts("2024-03-01 08:00:00"), "y", 15L, 30L, false),
      (ts("2024-03-01 09:00:00"), "x", 30L, 30L, true),
      (ts("2024-03-01 09:00:00"), "y", 0L, 30L, true)))

    // and the same definition runs as a live append-mode stream
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, Timestamp)]
    val out = EventOps.streamingDriftChi2(
      source.toDF().toDF("event_id", "event_type", "ts"),
      "event_type", "ts", "1 hour", "1 minute",
      Seq("x" -> 1L, "y" -> 1L), 384L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("drift_out").start()
    try {
      source.addData(rows.map(r => (r._1, r._2, r._3)): _*)
      q.processAllAvailable()
      // advance the watermark past window 1 so it closes and emits
      source.addData(("w", "x", ts("2024-03-01 10:30:00")))
      q.processAllAvailable()
      val streamed = spark.table("drift_out")
        .as[(Timestamp, String, Long, Long, Boolean)]
        .collect().sortBy(t => (t._1.getTime, t._2)).toSeq
      assert(streamed == got)
    } finally q.stop()
  }

  test("seasonalityProfile buckets by Spark dow/hour and shares sum to 1 per type") {
    // 2024-03-01 is a Friday -> Spark dayofweek = 6; 03-03 a Sunday -> 1
    val events = Seq(
      ("a", ts("2024-03-01 10:15:00")),
      ("a", ts("2024-03-01 10:45:00")),
      ("a", ts("2024-03-03 23:00:00")),
      ("b", ts("2024-03-03 00:00:00"))
    ).toDF("event_type", "ts")
    val got = EventOps.seasonalityProfile(events, "event_type", "ts")
      .select("event_type", "dow", "hour_of_day", "n", "share")
      .as[(String, Long, Long, Long, Double)].collect().sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(got == Seq(
      ("a", 1L, 23L, 1L, 1.0 / 3.0),
      ("a", 6L, 10L, 2L, 2.0 / 3.0),
      ("b", 1L, 0L, 1L, 1.0)))
  }

  test("rfm: recency vs the dataset max, monetary over the predicate only, 5=best") {
    val events = Seq(
      // u2: 3 events, last at the dataset max, 20.00 purchased
      (2L, "purchase", ts("2024-03-10 12:00:00"), 20.0),
      (2L, "view", ts("2024-03-09 12:00:00"), 3.0),
      (2L, "view", ts("2024-03-08 12:00:00"), 4.0),
      // u1: 2 events, 1 day stale, 10.00 purchased
      (1L, "purchase", ts("2024-03-09 12:00:00"), 10.0),
      (1L, "view", ts("2024-03-09 11:00:00"), 9.0),
      // u3: 1 event, 9 days stale, nothing purchased
      (3L, "view", ts("2024-03-01 12:00:00"), 50.0)
    ).toDF("user_id", "event_type", "ts", "value")
    val got = EventOps.rfm(events, "user_id", "ts", "value",
      col("event_type") === "purchase")
      .select("user_id", "recency_days", "frequency", "monetary_cents",
        "r_score", "f_score", "m_score")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1L, 2L, 1000L, 4L, 4L, 4L),
      (2L, 0L, 3L, 2000L, 5L, 5L, 5L),
      (3L, 9L, 1L, 0L, 3L, 3L, 3L)))
  }

  test("powerCurve: deciles over a total order, shares of all events") {
    val events = (1 to 4).flatMap { u =>
      (0 until u).map(i => (u.toLong, ts(f"2024-03-01 08:0$i%01d:00")))
    }.toDF("user_id", "ts")
    val got = EventOps.powerCurve(events, "user_id")
      .select("decile", "n_users", "n_events", "event_share")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // counts 4,3,2,1 over 4 users -> one user per decile 1..4
    assert(got == Seq(
      (1L, 1L, 4L, 0.4), (2L, 1L, 3L, 0.3),
      (3L, 1L, 2L, 0.2), (4L, 1L, 1L, 0.1)))
  }

  test("sequenceCount counts non-overlapping journey repeats") {
    val events = Seq(
      // u1: "vcpevp" — the error splits two v..p journeys (greedy
      // [^e]* cannot cross it); an unbroken "vcpvp" would be ONE match
      (1L, "view", ts("2024-03-01 08:00:00"), 1L),
      (1L, "click", ts("2024-03-01 08:01:00"), 2L),
      (1L, "purchase", ts("2024-03-01 08:02:00"), 3L),
      (1L, "error", ts("2024-03-01 08:02:30"), 4L),
      (1L, "view", ts("2024-03-01 08:03:00"), 5L),
      (1L, "purchase", ts("2024-03-01 08:04:00"), 6L),
      // u2: e v c -> no purchase, zero matches
      (2L, "error", ts("2024-03-01 08:00:00"), 7L),
      (2L, "view", ts("2024-03-01 08:01:00"), 8L),
      (2L, "click", ts("2024-03-01 08:02:00"), 9L),
      // u3: "vcpvp" -> greedy single match
      (3L, "view", ts("2024-03-01 08:00:00"), 10L),
      (3L, "click", ts("2024-03-01 08:01:00"), 11L),
      (3L, "purchase", ts("2024-03-01 08:02:00"), 12L),
      (3L, "view", ts("2024-03-01 08:03:00"), 13L),
      (3L, "purchase", ts("2024-03-01 08:04:00"), 14L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = EventOps.sequenceCount(events, "user_id", "event_type", "ts",
      "event_id", "v[^e]*p")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 6L, 2L), (2L, 3L, 0L), (3L, 5L, 1L)))
  }

  test("funnel modes: strict_order and strict_dedup break exactly the right chains") {
    val steps = Seq("view", "click", "purchase")
    val events = Seq(
      // u1: clean chain -> level 3 in every mode
      (1L, "view", ts("2024-03-01 08:00:00")),
      (1L, "click", ts("2024-03-01 08:10:00")),
      (1L, "purchase", ts("2024-03-01 08:20:00")),
      // u2: view view click purchase — repeated FIRST step before the
      // click: breaks strict_dedup at link 2, survives strict_order?
      // no — the second view also interleaves, so both break; default
      // completes
      (2L, "view", ts("2024-03-01 08:00:00")),
      (2L, "view", ts("2024-03-01 08:05:00")),
      (2L, "click", ts("2024-03-01 08:10:00")),
      (2L, "purchase", ts("2024-03-01 08:20:00")),
      // u3: view click view purchase — a view interleaves between
      // click and purchase: strict_order stops at 2; strict_dedup
      // cares only about a repeated CLICK, so it completes; default
      // completes
      (3L, "view", ts("2024-03-01 08:00:00")),
      (3L, "click", ts("2024-03-01 08:10:00")),
      (3L, "view", ts("2024-03-01 08:15:00")),
      (3L, "purchase", ts("2024-03-01 08:20:00")),
      // u4: view click click purchase — repeated SECOND step before
      // purchase: strict_dedup stops at 2; strict_order also stops
      // (the second click interleaves); default completes
      (4L, "view", ts("2024-03-01 08:00:00")),
      (4L, "click", ts("2024-03-01 08:10:00")),
      (4L, "click", ts("2024-03-01 08:15:00")),
      (4L, "purchase", ts("2024-03-01 08:20:00"))
    ).toDF("user_id", "event_type", "ts")
    def levels(mode: String): Map[Long, Int] =
      EventOps.funnelLevelsByKeyModal(events, Seq("user_id"), "event_type",
        "ts", steps, windowUs = 86400000000L, mode = mode)
        .as[(Long, Int)].collect().toMap
    assert(levels("default") == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3))
    assert(levels("strict_order") == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 2))
    assert(levels("strict_dedup") == Map(1L -> 3, 2L -> 1, 3L -> 3, 4L -> 2))
    // default mode must agree with the existing funnel core
    val classic = EventOps.funnelLevelsByKey(events, Seq("user_id"),
      "event_type", "ts", steps, 86400000000L)
      .as[(Long, Int)].collect().toMap
    assert(levels("default") == classic)
  }

  test("rollingUserFeatures: calendar-range trailing windows, leak-free future label") {
    val events = Seq(
      (1L, "view", ts("2024-03-01 12:00:00"), 1.0),
      (1L, "view", ts("2024-03-01 13:00:00"), 2.0),
      (1L, "purchase", ts("2024-03-02 12:00:00"), 10.0),
      (1L, "view", ts("2024-03-10 12:00:00"), 3.0),
      (1L, "purchase", ts("2024-03-11 12:00:00"), 5.0)
    ).toDF("user_id", "event_type", "ts", "value")
    val got = EventOps.rollingUserFeatures(events, "user_id", "ts", "value",
      col("event_type") === "purchase")
      .select("n_events", "n_events_7d", "n_purchases_30d",
        "purchase_cents_30d", "purchases_next_7d", "label_next_7d")
      .as[(Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq // window output is ordered per user by day
    assert(got == Seq(
      (2L, 2L, 0L, 0L, 1L, true),   // day 0: purchase lands tomorrow
      (1L, 3L, 1L, 1000L, 0L, false), // day 1: own purchase not a label
      (1L, 1L, 1L, 1000L, 1L, true),  // day 9: 7d window left the spike
      (1L, 2L, 2L, 1500L, 0L, false)))
  }

  test("property: PIT feature join never reads same-day or future data (3 seeds)") {
    import graft.operators.AsOfJoin
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed * 17 + 3)
      val base = ts("2024-03-01 00:00:00").getTime
      val raw = (1 to 300).map { i =>
        (rnd.nextInt(6).toLong,
          if (rnd.nextInt(4) == 0) "purchase" else "view",
          new Timestamp(base + rnd.nextInt(40 * 24) * 3600000L),
          rnd.nextInt(100) + 0.5, i.toLong)
      }
      val events = raw.toDF("user_id", "event_type", "ts", "value", "event_id")
      def dayOf(ms: Long): Long = math.floor(ms * 1000.0 / 86400000000.0).toLong
      // the exact q_pit_features wiring
      val features = EventOps.rollingUserFeatures(events, "user_id", "ts",
        "value", col("event_type") === "purchase")
        .withColumn("t", col("day_idx") + 1)
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          floor(unix_micros(col("ts")).cast("double") / lit(86400000000.0))
            .cast("long").as("t"))
      val joined = AsOfJoin.asof(purchases, features, Seq("user_id"), "t",
        Seq("event_id"), Seq("n_events_7d"), prefix = "f_")
        .select("user_id", "t", "event_id", "f_ts", "f_n_events_7d")
        .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
      // reference: per user, active days in order; the matched feature
      // day must be the latest STRICTLY before the event day, and its
      // 7d window recomputed from the raw seq must agree
      val byUser = raw.groupBy(_._1)
      joined.foreach { case (u, eventDay, _, fAvail, f7) =>
        val days = byUser(u).map(r => dayOf(r._3.getTime))
        val prior = days.filter(_ < eventDay)
        if (prior.isEmpty) {
          assert(fAvail.isEmpty && f7.isEmpty)
        } else {
          val fDay = prior.max
          assert(fAvail.contains(fDay + 1), s"seed=$seed u=$u d=$eventDay")
          assert(fDay < eventDay) // never same-day, never future
          val expected7 = days.count(d => d >= fDay - 6 && d <= fDay)
          assert(f7.contains(expected7.toLong), s"seed=$seed u=$u d=$eventDay")
        }
      }
    }
  }

  test("cohortLtv: first-seen cohorts, cumulative cents, per-user division") {
    val events = Seq(
      (1L, "view", ts("2024-01-05 10:00:00"), 1.0),
      (1L, "purchase", ts("2024-01-10 10:00:00"), 10.0),
      (1L, "purchase", ts("2024-02-03 10:00:00"), 5.0),
      (2L, "view", ts("2024-01-20 10:00:00"), 2.0),
      (2L, "purchase", ts("2024-03-15 10:00:00"), 20.0),
      (3L, "purchase", ts("2024-02-08 10:00:00"), 8.0)
    ).toDF("user_id", "event_type", "ts", "value")
    val got = EventOps.cohortLtv(events, "user_id", "ts", "value",
      col("event_type") === "purchase")
      .select("cohort_month", "months_since", "revenue_cents",
        "cum_revenue_cents", "cohort_users", "ltv_per_user")
      .as[(Timestamp, Long, Long, Long, Long, Double)]
      .collect().sortBy(t => (t._1.getTime, t._2)).toSeq
    val jan = ts("2024-01-01 00:00:00"); val feb = ts("2024-02-01 00:00:00")
    assert(got == Seq(
      (jan, 0L, 1000L, 1000L, 2L, 500.0),
      (jan, 1L, 500L, 1500L, 2L, 750.0),
      (jan, 2L, 2000L, 3500L, 2L, 1750.0),
      (feb, 0L, 800L, 800L, 1L, 800.0)))
  }

  test("stickiness: per-day distinct actives over the month's distinct actives") {
    val events = Seq(
      (1L, ts("2024-03-01 10:00:00")), (2L, ts("2024-03-01 11:00:00")),
      (2L, ts("2024-03-02 10:00:00")), (3L, ts("2024-03-02 11:00:00")),
      (3L, ts("2024-03-02 11:30:00")) // same user same day counts once
    ).toDF("user_id", "ts")
    val got = EventOps.stickiness(events, "user_id", "ts")
      .select("day", "dau", "mau", "stickiness")
      .as[(Timestamp, Long, Long, Double)].collect().sortBy(_._1.getTime).toSeq
    assert(got == Seq(
      (ts("2024-03-01 00:00:00"), 2L, 3L, 2.0 / 3.0),
      (ts("2024-03-02 00:00:00"), 2L, 3L, 2.0 / 3.0)))
  }

  test("kaplanMeier: censored users shrink the risk set without counting as deaths") {
    // all users enter 2024-03-01; deaths = first purchase
    val events = Seq(
      (1L, ts("2024-03-01 10:00:00"), "view"), (1L, ts("2024-03-02 10:00:00"), "purchase"),
      (2L, ts("2024-03-01 10:00:00"), "view"), (2L, ts("2024-03-03 10:00:00"), "purchase"),
      (3L, ts("2024-03-01 10:00:00"), "view"), (3L, ts("2024-03-02 10:00:00"), "view"),
      (4L, ts("2024-03-01 10:00:00"), "view"), (4L, ts("2024-03-04 10:00:00"), "view"),
      (5L, ts("2024-03-01 10:00:00"), "view"), (5L, ts("2024-03-02 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventOps.kaplanMeier(events, "user_id", "ts",
      col("event_type") === "purchase")
      .select("duration_days", "n_at_risk", "n_churned", "km_survival", "na_cum_hazard")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // t=1: risk 5 (u3 censored AT 1 still at risk), deaths u1+u5
    // t=2: risk 2 (u2, u4), death u2; u4 censored at t=3 never a death
    val s1 = 1.0 - 2.0 / 5.0
    val s2 = s1 * (1.0 - 1.0 / 2.0)
    val h1 = 2.0 / 5.0
    val h2 = h1 + 1.0 / 2.0
    assert(got == Map(1L -> ((5L, 2L, s1, h1)), 2L -> ((2L, 1L, s2, h2))))
    // rows exist only at death durations: the censor-only t=3 is absent
    assert(!got.contains(3L))
  }

  test("seasonalIndex: hour value vs type average in exact cross-multiplied bps") {
    val events = Seq(
      ("t", ts("2024-03-01 00:10:00"), Some(1.0)),
      ("t", ts("2024-03-02 00:20:00"), Some(1.0)), // hour 0: avg 100c
      ("t", ts("2024-03-01 01:10:00"), Some(4.0)), // hour 1: avg 400c
      ("t", ts("2024-03-01 02:00:00"), None) // null value: excluded
    ).toDF("event_type", "ts", "value")
    val got = EventOps.seasonalIndex(events, "event_type", "ts", "value")
      .select("hour_of_day", "n_events", "sum_cents", "index_bps")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // overall avg 200c: hour 0 runs at half par (5000 bps), hour 1 at 2x
    assert(got == Map(
      0L -> ((2L, 200L, 5000.0)),
      1L -> ((1L, 400L, 20000.0))))
  }

  test("topKSetChurn: overlap across OBSERVED days, ranks tie-broken on the key") {
    val events = Seq(
      // day 1 top-2 by value: a (5.0), b (3.0); c (1.0) misses
      (ts("2024-03-01 10:00:00"), "a", 5.0),
      (ts("2024-03-01 11:00:00"), "b", 3.0),
      (ts("2024-03-01 12:00:00"), "c", 1.0),
      // day 3 (calendar hole at day 2) top-2: b (4.0), c (2.0)
      (ts("2024-03-03 10:00:00"), "b", 4.0),
      (ts("2024-03-03 11:00:00"), "c", 2.0),
      (ts("2024-03-03 12:00:00"), "a", 0.5)
    ).toDF("ts", "name", "value")
    val got = EventOps.topKSetChurn(events, "name", "ts", "value", k = 2)
      .select("day", "prev_day", "k_today", "k_prev", "n_common", "n_new", "overlap_pct")
      .collect()
    assert(got.length == 1) // the hole pairs day 3 with day 1, not day 2
    val r = got.head
    assert(r.getDate(0).toString == "2024-03-03" &&
      r.getDate(1).toString == "2024-03-01")
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 1L && r.getLong(5) == 1L) // {b} shared, {c} new
    assert(r.getDouble(6) == 100.0 / 3.0) // |{b}| / |{a,b,c}|
  }

  test("topKSetChurn: identical consecutive leaderboards score full overlap") {
    val events = Seq(
      (ts("2024-03-01 10:00:00"), "a", 2.0), (ts("2024-03-01 11:00:00"), "b", 1.0),
      (ts("2024-03-02 10:00:00"), "a", 2.0), (ts("2024-03-02 11:00:00"), "b", 1.0)
    ).toDF("ts", "name", "value")
    val r = EventOps.topKSetChurn(events, "name", "ts", "value", k = 2).head()
    assert(r.getAs[Long]("n_common") == 2L && r.getAs[Long]("n_new") == 0L)
    assert(r.getAs[Double]("overlap_pct") == 100.0)
  }

  test("cupedReadout: a pure covariate effect is fully adjusted away") {
    // y = 10 dollars per view exactly, arms deliberately imbalanced in
    // views: theta = 1000 cents/view exactly, and both adjusted means
    // collapse to 1000 * global mean views — the covariate-driven
    // difference vanishes while the raw means differ.
    val rows = (1 to 40).flatMap { u =>
      val views = if (u % 2 == 0) 2 else 6 // imbalance follows parity, not the arm hash
      Seq.fill(views)((u.toLong, "view", 0.0)) :+
        ((u.toLong, "purchase", views * 10.0))
    }
    val events = rows.toDF("user_id", "event_type", "value")
    val out = EventOps.cupedReadout(events, "user_id", "event_type", "value",
      covariateType = "view", metricType = "purchase",
      splits = Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getAs[String]("variant") -> r).toMap
    assert(out.size == 2)
    val globalMeanViews = 40.0 * 4 / 40 // 4 views per user on average
    out.values.foreach { r =>
      assert(r.getAs[Double]("theta") == 1000.0)
      assert(math.abs(
        r.getAs[Double]("mean_y_adj_cents") - 1000.0 * globalMeanViews) < 1e-6,
        r.toString)
    }
    // raw means differ across arms unless the hash split exactly
    // balances parity (it doesn't for 1..40: asserted by construction)
    val raw = out.values.map(_.getAs[Double]("mean_y_cents")).toSeq
    assert(raw.distinct.size == 2)
  }
}
