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

  test("streamingRowReport: per-window violation counts on a stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val src = MemoryStream[(Long, Double, java.sql.Timestamp)]
    val report = QualityReport.streamingRowReport(
      src.toDF().toDF("id", "value", "ts"), "ts", "10 minutes", "5 minutes",
      Seq(QualityReport.inRange("range", col("value"), 0.0, 100.0)))
    val q = report.writeStream.outputMode("complete")
      .format("memory").queryName("dq_stream").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      src.addData((1L, 5.0, t("2024-03-01 08:01:00")),
        (2L, 500.0, t("2024-03-01 08:02:00")),
        (3L, 7.0, t("2024-03-01 08:11:00")))
      q.processAllAvailable()
      val got = spark.table("dq_stream")
        .select(col("window_start").cast("string"), col("violations"), col("total"))
        .as[(String, Long, Long)].collect().toSet
      assert(got == Set(
        ("2024-03-01 08:00:00", 1L, 2L),
        ("2024-03-01 08:10:00", 0L, 1L)))
    } finally q.stop()
  }

  test("edge: empty frames and singleton groups stay well-defined") {
    import graft.operators.{EntityOps, EventOps}
    val emptyEv = Seq.empty[(Long, String, java.sql.Timestamp)]
      .toDF("user_id", "event_type", "ts")
    assert(EventOps.funnelSteps(emptyEv, "user_id", "event_type", "ts",
      Seq("view", "click"), windowUs = 1000L).count() == 0)
    assert(EventOps.retentionCohorts(emptyEv, "user_id", "ts").count() == 0)

    // variance-zero singleton: 0 > 0 is false, no flag, no crash
    val one = Seq(("g", 1L, 5.0)).toDF("grp", "id", "value")
    assert(EventOps.sigmaOutliers(one, "grp", "value", k = 3).count() == 0)
    assert(EventOps.madOutliers(one, "grp", "value", k = 5.0).count() == 0)

    val noNames = Seq.empty[Tuple1[String]].toDF("p_name")
    assert(EntityOps.fuzzyNamePairs(noNames, "p_name", maxDist = 2).count() == 0)

    // null metric values are excluded from both stats and flagging
    val withNull = Seq(("g", 1L, Some(5.0)), ("g", 2L, None),
      ("g", 3L, Some(5.0)), ("g", 4L, Some(5.0))).toDF("grp", "id", "value")
    assert(EventOps.sigmaOutliers(withNull, "grp", "value", k = 3).count() == 0)
    assert(EventOps.madOutliers(withNull, "grp", "value", k = 5.0).count() == 0)
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
