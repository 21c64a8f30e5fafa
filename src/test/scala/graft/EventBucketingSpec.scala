package graft

import java.sql.Timestamp

import graft.operators.{EventOps, SessionOps}
import graft.sources.BucketedStore

/** The 100 TB layout proof for event analytics: events bucketed on
  * the user key make every per-user analytic (funnel, sessions,
  * paths) read co-located data — the per-user window and aggregate
  * consume the bucketing, so the event stream itself is never
  * shuffled; only answer-sized frames exchange.
  */
class EventBucketingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val prepared: Unit = {
    val rnd = new scala.util.Random(13)
    val types = Vector("view", "click", "purchase", "error")
    val ev = (1 to 4000).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, types(rnd.nextInt(types.size)),
        new Timestamp(1709280000000L + rnd.nextInt(500000) * 100L))
    }.toDF("user_id", "event_id", "event_type", "ts")
    spark.sql("DROP TABLE IF EXISTS b_events")
    BucketedStore.writeBucketed(ev, "b_events", Seq("user_id"), 8)
  }

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).size

  test("funnel over user-bucketed events: the stream never shuffles") {
    prepared
    val bucketed = spark.table("b_events")
    val funnel = EventOps.funnelSteps(bucketed, "user_id", "event_type",
      "ts", Seq("view", "click", "purchase"), windowUs = 3600000000L)
    val plan = funnel.queryExecution.executedPlan.toString
    // only the final step aggregation (a users-sized frame) exchanges;
    // the event scan feeds the window via its bucketing
    assert(exchanges(plan) == 1, s"expected 1 exchange, got:\n$plan")

    // same query unbucketed shuffles the events too
    val raw = EventOps.funnelSteps(spark.table("b_events").repartition(5),
      "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), windowUs = 3600000000L)
    assert(exchanges(raw.queryExecution.executedPlan.toString) == 2)

    // and the result is identical either way
    assert(funnel.collect().toSet == raw.collect().toSet)
  }

  test("sessionization over user-bucketed events: zero exchanges") {
    prepared
    val sessions = SessionOps.assignSessions(
      spark.table("b_events"), Seq("user_id"), "ts", gapSeconds = 600L)
    val plan = sessions.queryExecution.executedPlan.toString
    assert(exchanges(plan) == 0, s"expected no exchange, got:\n$plan")
  }

  test("rolling outlier monitor over bucketed events: zero exchanges") {
    prepared
    val flags = EventOps.rollingSigmaOutliers(
      spark.table("b_events").withColumn("value",
        org.apache.spark.sql.functions.lit(5.0)),
      "user_id", "ts", "event_id", "value", windowRows = 20, k = 3)
    val plan = flags.queryExecution.executedPlan.toString
    assert(exchanges(plan) == 0, s"expected no exchange, got:\n$plan")
  }
}
