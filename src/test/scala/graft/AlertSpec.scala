package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Timeframe
import graft.operators.AlertOps
import graft.streaming.AlertStream

/** S7 — the alert side-channel: batch quality findings become alert
  * rows; streaming query failures become alert rows via the listener.
  */
class AlertSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("qualityAlerts emits gap and stale alerts with formatted details") {
    // A: minutes 08:00-08:09 and 09:10-09:19 (60-minute hole), fresh
    // B: one old event (stale vs the 10:00 anchor)
    val rows =
      ((0 until 10) ++ (70 until 80)).map(m =>
        ("A", ts(f"2024-03-01 ${8 + m / 60}%02d:${m % 60}%02d:00"), 1.0)) :+
        (("B", ts("2024-03-01 06:00:00"), 1.0))
    val df = rows.toDF("symbol", "t", "v")
    val alerts = AlertOps.qualityAlerts(
      df, Seq("symbol"), "t", Seq(Timeframe.parse("1m"), Timeframe.parse("1h")),
      anchor = lit("2024-03-01 10:00:00").cast("timestamp"),
      staleThresholdUs = 30L * 60 * 1000000, // 30 min
      minMissing = 10L)
    val got = alerts
      .select("alert_type", "severity", "entity", "grain", "n", "detail")
      .as[(String, String, String, Option[String], Long, String)]
      .collect().toSet
    assert(got == Set(
      ("gap", "warn", "A", Some("1m"), 60L,
        "missing 60 buckets from 2024-03-01 08:10:00 to 2024-03-01 09:09:00"),
      ("stale", "crit", "A", None, 41L * 60 * 1000000, // last event 09:19
        "no data since 2024-03-01 09:19:00 (lag 2460 s)"),
      ("stale", "crit", "B", None, 4L * 3600 * 1000000,
        "no data since 2024-03-01 06:00:00 (lag 14400 s)")))
  }

  test("streaming listener turns a failed query into a crit alert and stays quiet otherwise") {
    implicit val sqlCtx = spark.sqlContext
    val listener = AlertStream.attach(spark)
    try {
      // healthy query: no alerts
      val ok = MemoryStream[Int]
      ok.addData(1, 2, 3)
      val okQ = ok.toDF().writeStream
        .queryName("alert_ok")
        .format("noop")
        .trigger(Trigger.AvailableNow())
        .start()
      okQ.awaitTermination()

      // failing query: foreachBatch throws
      val bad = MemoryStream[Int]
      bad.addData(1)
      val badQ = bad.toDF().writeStream
        .queryName("alert_bad")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new RuntimeException("sink exploded")
        }
        .start()
      intercept[Exception] { badQ.awaitTermination() }
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (listener.alerts.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)

      val alerts = listener.alerts
      assert(alerts.exists(a =>
        a.alert_type == "stream_failed" && a.severity == "crit" &&
          a.query_name == "alert_bad"))
      assert(!alerts.exists(_.query_name == "alert_ok"))
      assert(listener.alertsDf(spark).count() == alerts.size.toLong)
    } finally AlertStream.detach(spark, listener)
  }
}
