package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.EventOps
import graft.streaming.FunnelStream

case class UserEvent(user_id: Long, event_type: String, ts: Timestamp)

/** Streaming funnel: levels emit only after the watermark closes the
  * window, equal the batch operator's levels on the same data, stay
  * equal when the same events arrive shuffled across micro-batches
  * (out-of-order within the watermark), and episode boundaries depend
  * on event times, not arrival batching.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val steps = Seq("view", "click", "purchase")
  private val H = 3600000000L // 1h in us

  // deterministic random stream over 8 users, 2024-03-01 08:00-16:00
  private def randomEvents(seed: Int): Seq[UserEvent] = {
    val rnd = new scala.util.Random(seed)
    val types = Vector("view", "click", "purchase", "error", "signup")
    (1 to 300).map { _ =>
      UserEvent(
        rnd.nextInt(8).toLong,
        types(rnd.nextInt(types.size)),
        new Timestamp(
          Timestamp.valueOf("2024-03-01 08:00:00").getTime
            + rnd.nextInt(8 * 3600) * 1000L))
    }
  }

  /** Batch per-user levels via the same public operator: funnelSteps
    * emits cumulative step counts, so recover the level histogram and
    * compare that (same information, engine-computed).
    */
  private def batchStepCounts(events: Seq[UserEvent]): Map[Int, Long] =
    EventOps.funnelSteps(events.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", steps, windowUs = 2 * H)
      .select("step", "n_users").as[(Int, Long)].collect().toMap

  /** All emissions per user, as (level, anchor) pairs. */
  private def streamEpisodes(
      batches: Seq[Seq[UserEvent]],
      flushTo: Timestamp): Map[String, Seq[(Int, Timestamp)]] = {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[UserEvent]
    val name = s"funnel_out_${System.nanoTime()}"
    val q = FunnelStream.funnelLevels(
      source.toDF(), "user_id", "event_type", "ts", steps,
      windowUs = 2 * H, watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      // advance the watermark far past every window close. Flushes must
      // be STEP events: timeouts only process in batches whose stateful
      // operator receives rows (see FunnelStream's liveness note) —
      // and twice, because the watermark updates at batch end and
      // timeouts fire the batch after.
      source.addData(UserEvent(999999L, "view", flushTo))
      q.processAllAvailable()
      source.addData(UserEvent(999998L, "view",
        new Timestamp(flushTo.getTime + 3600000L)))
      q.processAllAvailable()
      source.addData(UserEvent(999997L, "view",
        new Timestamp(flushTo.getTime + 7200000L)))
      q.processAllAvailable()
      spark.table(name)
        .select("user_id", "level", "anchor_ts")
        .as[(String, Int, Timestamp)].collect()
        .groupBy(_._1)
        .filterNot { case (u, _) =>
          Set("999999", "999998", "999997")(u) // the flush users
        }
        .map { case (u, rs) =>
          u -> rs.map(r => (r._2, r._3)).sortBy(_._2.getTime).toSeq
        }
    } finally q.stop()
  }

  /** First episode (min anchor) per user — the batch-equivalent view. */
  private def streamLevels(
      batches: Seq[Seq[UserEvent]], flushTo: Timestamp): Map[String, Int] =
    streamEpisodes(batches, flushTo).map { case (u, eps) => u -> eps.head._1 }

  test("streaming levels == batch levels, in-order and shuffled batches") {
    val events = randomEvents(5)
    val flush = ts("2024-03-03 00:00:00")

    val batch = batchStepCounts(events)

    // in-order: one batch per 2h slice
    val inOrder = events.sortBy(_.ts.getTime).grouped(80).toSeq
    val gotInOrder = streamLevels(inOrder, flush)

    // adversarial within the contract: arrival order = event time plus
    // bounded jitter (< the 10 min watermark), so events land out of
    // order across batches but never beyond allowed lateness
    // (precomputed keys: a Random inside sortBy's key function would
    // be re-drawn per comparison — an inconsistent comparator)
    val rnd = new scala.util.Random(7)
    val jittered = events
      .map(e => (e, e.ts.getTime + (rnd.nextInt(540) - 270) * 1000L))
      .sortBy(_._2).map(_._1)
      .grouped(60).toSeq
    val gotShuffled = streamLevels(jittered, flush)

    assert(gotInOrder == gotShuffled)
    // histogram equivalence with the batch operator (batch reports
    // cumulative users-reaching-step)
    def cum(levels: Map[String, Int]): Map[Int, Long] =
      (1 to steps.size)
        .map(s => s -> levels.count { case (_, l) => l >= s }.toLong).toMap
    assert(cum(gotInOrder) == batch)
  }

  test("property: jittered + duplicate delivery preserves every episode (3 seeds)") {
    // at-least-once upstream within the watermark contract: events
    // arrive out of order (bounded jitter < the 10 min watermark),
    // some delivered TWICE, batched at random — the emitted episode
    // sequence per user must equal the clean in-order run's, and the
    // first-episode levels must equal the batch operator's histogram
    val flush = ts("2024-03-03 00:00:00")
    (11 to 13).foreach { seed =>
      val events = randomEvents(seed)
      val clean = streamEpisodes(
        Seq(events.sortBy(_.ts.getTime)), flush)

      val rnd = new scala.util.Random(seed * 31 + 7)
      val withDups = events.flatMap { e =>
        if (rnd.nextInt(4) == 0) Seq(e, e) else Seq(e) // ~25% redelivered
      }
      // precomputed jitter keys (a Random inside sortBy's key function
      // would be re-drawn per comparison — an inconsistent comparator)
      val arrival = withDups
        .map(e => (e, e.ts.getTime + (rnd.nextInt(540) - 270) * 1000L))
        .sortBy(_._2).map(_._1)
      // random batch boundaries
      val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[UserEvent]]
      var rest = arrival
      while (rest.nonEmpty) {
        val n = 40 + rnd.nextInt(60)
        batches += rest.take(n)
        rest = rest.drop(n)
      }
      val jittered = streamEpisodes(batches.toSeq, flush)
      assert(jittered == clean, s"seed $seed: episodes diverged")

      val levels = jittered.map { case (u, eps) => u -> eps.head._1 }
      def cum(ls: Map[String, Int]): Map[Int, Long] =
        (1 to steps.size)
          .map(s => s -> ls.count { case (_, l) => l >= s }.toLong).toMap
      assert(cum(levels) == batchStepCounts(events), s"seed $seed: batch mismatch")
    }
  }

  test("episodes depend on event times, not arrival batching") {
    // a bursty catch-up read delivers BOTH episodes in one batch: the
    // first window (view@08:00, level 1) and a second far past it
    // (view@20:00 -> click@20:30, level 2). The later events must be
    // retained while the first window is still open.
    val burst = Seq(
      UserEvent(1L, "view", ts("2024-03-01 08:00:00")),
      UserEvent(1L, "view", ts("2024-03-01 20:00:00")),
      UserEvent(1L, "click", ts("2024-03-01 20:30:00")))
    val oneBatch = streamEpisodes(Seq(burst), ts("2024-03-03 00:00:00"))
    val twoBatches = streamEpisodes(
      Seq(burst.take(1), burst.drop(1)), ts("2024-03-03 00:00:00"))
    val expect = Seq(
      (1, ts("2024-03-01 08:00:00")),
      (2, ts("2024-03-01 20:00:00")))
    assert(oneBatch("1") == expect)
    assert(twoBatches("1") == expect)
  }

  test("no emission before the window can close; GC users never emit") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[UserEvent]
    val q = FunnelStream.funnelLevels(
      source.toDF(), "user_id", "event_type", "ts", steps,
      windowUs = 2 * H, watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_open").start()
    try {
      source.addData(
        UserEvent(1L, "view", ts("2024-03-01 08:00:00")),
        UserEvent(1L, "click", ts("2024-03-01 08:30:00")),
        UserEvent(2L, "error", ts("2024-03-01 08:00:00"))) // never steps
      q.processAllAvailable()
      assert(spark.table("funnel_open").isEmpty) // window still open

      // watermark moves past u1's close (08:00 + 2h + 10min)
      source.addData(UserEvent(3L, "view", ts("2024-03-01 11:00:00")))
      q.processAllAvailable()
      source.addData(UserEvent(3L, "error", ts("2024-03-01 11:00:01")))
      q.processAllAvailable()
      val got = spark.table("funnel_open").select("user_id", "level")
        .as[(String, Int)].collect().toMap
      assert(got.get("1").contains(2)) // view+click, no purchase
      assert(!got.contains("2")) // GC'd without emission
    } finally q.stop()
  }
}
