package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityReport

/** Declarative data-quality probes: planted violations are counted by
  * the right rule, all row rules share one aggregate (single scan),
  * and clean data reports zeros without dropping rules.
  */
class QualityReportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    (1L, Some(10.0), "view"),
    (2L, None, "click"),         // null value
    (3L, Some(-5.0), "view"),    // below range
    (3L, Some(20.0), "badtype"), // dup id + unknown type
    (4L, Some(2000.0), "view")   // above range
  ).toDF("id", "value", "event_type")

  test("row rules, uniqueness, and ref integrity count planted faults") {
    val parents = Seq(1L, 2L, 3L).toDF("pid")
    val got = QualityReport.report(
      QualityReport.rowReport(rows, Seq(
        QualityReport.notNull("value_not_null", col("value")),
        QualityReport.inRange("value_range", col("value"), 0.0, 1000.0),
        QualityReport.matches("type_known", col("event_type"), "^(view|click)$"))),
      QualityReport.uniqueKey(rows, "id_unique", Seq("id")),
      QualityReport.refIntegrity(rows, "id", parents, "pid", "orphans"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    assert(got("value_not_null") == ((1L, 5L)))
    assert(got("value_range") == ((3L, 5L)))   // null counts as out-of-range
    assert(got("type_known") == ((1L, 5L)))
    assert(got("id_unique") == ((1L, 5L)))     // one row beyond the first
    assert(got("orphans") == ((1L, 5L)))       // id 4 has no parent
  }

  test("all row rules share ONE aggregate: a single scan in the plan") {
    val plan = QualityReport.rowReport(rows, Seq(
      QualityReport.notNull("a", col("value")),
      QualityReport.inRange("b", col("value"), 0, 1),
      QualityReport.matches("c", col("event_type"), "x"))).queryExecution
      .executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size +
      "Scan ExistingRDD".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan:\n$plan")
  }

  test("clean data reports zeros, keeps every rule row") {
    val clean = Seq((1L, 5.0, "view")).toDF("id", "value", "event_type")
    val got = QualityReport.report(
      QualityReport.rowReport(clean, Seq(
        QualityReport.notNull("nn", col("value")))),
      QualityReport.uniqueKey(clean, "uq", Seq("id")))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("nn", 0L, 1L), ("uq", 0L, 1L)))
  }
}
