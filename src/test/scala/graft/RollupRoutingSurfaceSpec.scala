package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RollupRouter

import graft.operators.{CandleOps, RollupStore}

/** RollupRouting exercised against the REAL query surface (the
  * reference's notebook-level manual table choice — ipynb cell 2
  * `TABLES` dict — made automatic and safe): with the rule globally
  * enabled and a registered store, every candle-family `SparkEntry`
  * query must return BIT-identical results to its rule-off run (the
  * fail-safe direction on the production surface), and the §2 rollup
  * shapes over a plain base table must actually READ the store (the
  * routed direction), including the carrier-producing shape that
  * cascade/sma/rank consume.
  */
class RollupRoutingSurfaceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Candle-family §2 queries (B/A/W/R rows over the events table). */
  private val family = Seq(
    "q_ohlcv_rollup_15m", "q_ohlcv_rollup_1h", "q_rollup_cascade_15m_to_1h",
    "q_sma", "q_rank_by_volume", "q_minmax_window", "q_earliest_per_symbol",
    "q_recent_per_key", "q_dedup_latest", "q_obv", "q_vpin", "q_bollinger")

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toString).sorted.toSeq
  }

  test("rule enabled on the real surface: every candle-family query hash-unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_surface").toString
    // a store over the events rollup, with routes registered for BOTH
    // the mirror base (roulable shape) and the real events.parquet path
    // (whose nanos-cast read shape must fail-safe, never mis-route)
    val base = graft.sources.Tables.events(spark, sfDir)
    base.write.mode("overwrite").parquet(s"$dir/base")
    RollupStore.buildWithCarriers(
      spark.read.parquet(s"$dir/base"), Seq("user_id"), "ts", "value",
      "15 minutes", s"$dir/rollup_15m")
    RollupRouter.clear()
    assert(RollupRouter.registerFromStore(spark, dir) == 1)
    RollupRouter.register(RollupRouter.Route(
      s"$sfDir/events.parquet", Seq("user_id"), "ts", "value",
      Map(900L -> s"$dir/rollup_15m")))

    val rule = new RollupRouter.RouteRule(spark)
    val mismatched = family.flatMap { name =>
      val fn = SparkEntry.queries(name)
      spark.experimental.extraOptimizations = Seq(rule)
      val routedRun =
        try canon(fn(spark, sfDir))
        finally spark.experimental.extraOptimizations = Nil
      val plainRun = canon(fn(spark, sfDir))
      if (routedRun == plainRun) None else Some(name)
    }
    RollupRouter.clear()
    assert(mismatched.isEmpty,
      s"rule changed results for: ${mismatched.mkString(", ")}")
  }

  test("routed direction: the §2 rollup shapes over a plain base read the store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_surface2").toString
    val basePath = s"$dir/base"
    graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "ts", "value")
      .write.mode("overwrite").parquet(basePath)
    RollupStore.buildWithCarriers(
      spark.read.parquet(basePath), Seq("user_id"), "ts", "value",
      "15 minutes", s"$dir/rollup_15m")
    RollupRouter.clear()
    assert(RollupRouter.registerFromStore(spark, dir) == 1)
    val rule = new RollupRouter.RouteRule(spark)

    def run(tag: String, expectRouted: Boolean)(build: => DataFrame): Unit = {
      spark.experimental.extraOptimizations = Seq(rule)
      val routed = build
      val plan = routed.queryExecution.executedPlan.toString()
      if (expectRouted)
        assert(plan.contains("rollup_15m") && !plan.contains("/base"),
          s"$tag: expected a routed scan:\n$plan")
      else
        assert(!plan.contains("rollup_15m"), s"$tag: must not route:\n$plan")
      val got = canon(routed)
      spark.experimental.extraOptimizations = Nil
      val want = canon(build)
      assert(got == want, s"$tag: routed result differs")
    }

    def baseDf = spark.read.parquet(basePath)
    // the finished rollup shapes (q_ohlcv_rollup_15m / _1h engine code)
    run("rollup 15m", expectRouted = true)(
      CandleOps.ohlcvRollup(baseDf, Seq("user_id"), "ts", "value", "15 minutes"))
    run("rollup 1h", expectRouted = true)(
      CandleOps.ohlcvRollup(baseDf, Seq("user_id"), "ts", "value", "1 hour"))
    // the CARRIER shape (what cascade / sma / rank consume), now
    // routable via the min(ts)->open_ts / max(ts)->close_ts rewrites
    run("carrier rollup 15m", expectRouted = true)(
      CandleOps.ohlcvRollup(baseDf, Seq("user_id"), "ts", "value",
        "15 minutes", withCarriers = true))
    // cascade on top of the routed carrier aggregate (A6 / R1)
    run("cascade 15m->1h", expectRouted = true)(
      CandleOps.cascadeRollup(
        CandleOps.ohlcvRollup(baseDf, Seq("user_id"), "ts", "value",
          "15 minutes", withCarriers = true),
        Seq("user_id"), "bucket_ts", "1 hour"))
    // windowed consumers over the routed carrier (q_sma / q_rank shape)
    run("sma over carriers", expectRouted = true) {
      val r1h = CandleOps.ohlcvRollup(baseDf, Seq("user_id"), "ts", "value",
        "1 hour", withCarriers = true)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("bucket_ts")).rowsBetween(-6, 0)
      r1h.select(col("user_id"), col("bucket_ts"), col("close"),
        (graft.functions.Cents.centsToMoney(sum(col("vol_cents")).over(w)) /
          count(lit(1)).over(w)).as("vol_sma7"))
    }
    // an unroutable grain must fail-safe to the base scan
    run("7-minute grain (unaligned)", expectRouted = false)(
      CandleOps.ohlcvRollup(baseDf, Seq("user_id"), "ts", "value", "7 minutes"))
    RollupRouter.clear()
  }
}
