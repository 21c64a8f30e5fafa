package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.DriftStream

case class Ev(event_type: String, t: Timestamp, value: Option[Double])

/** Streaming drift gate: windowed stats vs a static baseline — the
  * null-rate cross-multiply and range breach must match the batch
  * semantics, unseen types must flag, and clean windows must not.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("statsGate flags null surge, range breach, and unseen types; clean windows pass") {
    implicit val sqlCtx = spark.sqlContext
    // baseline: "pay" has no nulls, cents range [100, 300]
    val history = Seq(
      ("pay", 1.0), ("pay", 2.0), ("pay", 3.0), ("pay", 2.0)
    ).toDF("event_type", "value")
    val baseline = DriftStream.baselineProfile(history, "event_type", "value")

    val source = MemoryStream[Ev]
    val out = DriftStream.statsGate(
      source.toDF(), "event_type", "t", "value",
      windowLen = "1 hour", watermark = "0 seconds", baseline,
      thresholdMilli = 100L)
    val q = out.writeStream
      .outputMode("append").format("memory").queryName("drift_out").start()
    try {
      source.addData(
        // window 08: clean — in-range values, no nulls
        Ev("pay", ts("2024-03-01 08:10:00"), Some(1.5)),
        Ev("pay", ts("2024-03-01 08:20:00"), Some(2.5)),
        // window 09: half null (500 milli > 100) and one breach value
        Ev("pay", ts("2024-03-01 09:10:00"), Some(9.0)),
        Ev("pay", ts("2024-03-01 09:20:00"), None),
        // window 09: a type the baseline never saw
        Ev("refund", ts("2024-03-01 09:30:00"), Some(1.0)))
      q.processAllAvailable()
      // advance the watermark past both windows so they emit
      source.addData(Ev("pay", ts("2024-03-01 11:00:00"), Some(2.0)))
      q.processAllAvailable()
      val got = spark.table("drift_out")
        .select("window_start", "event_type", "n", "n_null",
          "null_drifted", "range_breach")
        .as[(Timestamp, String, Long, Long, Boolean, Boolean)]
        .collect().sortBy(r => (r._1.getTime, r._2)).toSeq
      assert(got == Seq(
        (ts("2024-03-01 08:00:00"), "pay", 2L, 0L, false, false),
        (ts("2024-03-01 09:00:00"), "pay", 2L, 1L, true, true),
        (ts("2024-03-01 09:00:00"), "refund", 1L, 0L, true, true)))
    } finally q.stop()
  }

  test("statsGate is invariant to arrival order and batch slicing within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val history = Seq(("pay", 1.0), ("pay", 2.0)).toDF("event_type", "value")
    val baseline = DriftStream.baselineProfile(history, "event_type", "value")
    val evs = Seq(
      Ev("pay", ts("2024-03-01 08:05:00"), Some(1.5)),
      Ev("pay", ts("2024-03-01 08:50:00"), None),
      Ev("pay", ts("2024-03-01 08:20:00"), Some(5.0)),
      Ev("pay", ts("2024-03-01 08:35:00"), Some(1.0)))
    val rnd = new scala.util.Random(7)

    def run(order: Seq[Ev], slices: Int): Seq[(Timestamp, String, Long, Long, Boolean, Boolean)] = {
      val source = MemoryStream[Ev]
      val name = s"drift_jitter_${rnd.nextInt(1 << 30)}"
      val q = DriftStream.statsGate(
        source.toDF(), "event_type", "t", "value",
        windowLen = "1 hour", watermark = "1 hour", baseline,
        thresholdMilli = 100L)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        order.grouped(math.max(1, order.size / slices)).foreach { g =>
          source.addData(g: _*); q.processAllAvailable()
        }
        // close the window: watermark must pass 09:00 + 1h
        source.addData(Ev("pay", ts("2024-03-01 11:30:00"), Some(1.0)))
        q.processAllAvailable()
        spark.table(name)
          .select("window_start", "event_type", "n", "n_null",
            "null_drifted", "range_breach")
          .as[(Timestamp, String, Long, Long, Boolean, Boolean)]
          .collect().sortBy(r => (r._1.getTime, r._2)).toSeq
      } finally q.stop()
    }

    val want = run(evs, slices = 1)
    assert(want.nonEmpty)
    (1 to 3).foreach { _ =>
      assert(run(rnd.shuffle(evs), slices = 1 + rnd.nextInt(4)) == want)
    }
  }
}
