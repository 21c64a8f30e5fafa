package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.api.EventTable
import graft.operators.QualityReport

/** The fluent facade delegates to the same operators (spot-checked
  * row-for-row) and its filters compose as pushed-down predicates.
  */
class EventTableSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val ev = EventTable(
    Seq(
      (1L, "view", ts("2024-03-01 08:00:00"), 1L, 10.0),
      (1L, "click", ts("2024-03-01 08:10:00"), 2L, 20.0),
      (1L, "purchase", ts("2024-03-01 08:20:00"), 3L, 500.0),
      (2L, "view", ts("2024-03-01 09:00:00"), 4L, 15.0),
      (2L, "view", ts("2024-03-02 09:00:00"), 5L, 15.0)
    ).toDF("user_id", "event_type", "ts", "event_id", "value"),
    "user_id", "event_type", "ts", "event_id")

  test("facade results match the operators they wrap") {
    val funnel = ev.funnel(Seq("view", "click", "purchase"), 3600000000L)
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(funnel == Seq((1, "view", 2L), (2, "click", 1L), (3, "purchase", 1L)))

    val ret = ev.retention().select("day_offset", "n_users")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(ret == Seq((0L, 2L), (1L, 1L)))

    val life = ev.lifecycle().select("n_new").as[Long].collect().sorted.toSeq
    assert(life.sum == 2L)

    assert(ev.sequenceMatch("v.*p").where(col("matched")).count() == 1)
    assert(ev.paths(5).as[(String, Long)].head() == (("view>click>purchase", 1L)))

    val q = ev.quality(Seq(QualityReport.inRange("r", col("value"), 0, 100)))
      .as[(String, Long, Long)].head()
    assert(q == (("r", 1L, 5L)))

    // u1's 500.00 purchase credits view (first) and click (last);
    // linear splits 50000 cents over both touches
    val attr = ev.attribution("value", "purchase", 86400000000L)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(attr == Seq(
      ("click", 1L, 0L, 0L, 1L, 50000L, 25000000000L),
      ("view", 1L, 1L, 50000L, 0L, 0L, 25000000000L)))

    val dr = ev.drift("2024-03-02 00:00:00")
      .select("event_type", "n_a", "n_b")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(dr == Seq(("click", 1L, 0L), ("purchase", 1L, 0L), ("view", 2L, 1L)))
  }

  test("analytics facade delegates carry the operator column contracts") {
    assert(ev.rfm("value", "purchase").columns.contains("m_score"))
    assert(ev.powerCurve().columns.contains("event_share"))
    assert(ev.stickiness().columns.contains("stickiness"))
    assert(ev.cohortLtv("value", "purchase").columns.contains("ltv_per_user"))
    assert(ev.seasonality().columns.contains("share"))
    assert(ev.userFeatures("value", "purchase").columns.contains("label_next_7d"))
    assert(ev.rfm("value", "purchase").count() > 0)
    assert(ev.userFeatures("value", "purchase").count() > 0)
    assert(ev.funnelLevels(Seq("view", "click"), 86400000000L, "strict_order")
      .columns.contains("level"))
    assert(ev.sequenceCount("v[^e]*p").columns.contains("n_matches"))
    assert(ev.valueDrift("value", "2024-03-02 00:00:00")
      .columns.contains("drifted"))
    assert(ev.statsDrift("value", "2024-03-02 00:00:00")
      .columns.contains("null_drifted"))
  }

  test("ofType/between compose as plain filters") {
    // (pushdown-to-parquet is covered by PruningSpec; a local relation
    // folds the predicate into the scan entirely)
    val n = ev.ofType("view").between(
      ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00")).df.count()
    assert(n == 2L)
    assert(ev.ofType("purchase").df.count() == 1L)
  }

  test("round-6 facades carry the operator column contracts and run") {
    assert(ev.topKChurn("value", k = 2).columns.contains("n_common"))
    val si = ev.seasonalIndex("value")
    assert(si.columns.contains("index_bps") && si.count() > 0)
    val sv = ev.survival("purchase")
    assert(sv.columns.contains("km_survival") &&
      sv.columns.contains("na_cum_hazard"))
    // user 1 converts at duration 0, user 2 never does (censored):
    // S(0) = 1 - 1/2
    val row = sv.select("duration_days", "n_at_risk", "n_churned", "km_survival")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(row == Seq((0L, 2L, 1L, 0.5)))
  }

  test("cuped facade delegates with the readout column contract") {
    val out = ev.cuped("value", covariateType = "view", metricType = "purchase")
    assert(out.columns.toSet == Set("variant", "n_users", "sum_y_cents",
      "sum_x", "theta", "mean_y_cents", "mean_y_adj_cents"))
    assert(out.count() >= 1)
  }
}
