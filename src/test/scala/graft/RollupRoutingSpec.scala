package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RollupRouter

import graft.operators.{CandleOps, RollupStore}

/** The MV-routing optimizer rule: an OHLCV aggregate over the base
  * table silently reads the coarsest sufficient materialized rollup —
  * same results, rollup-sized scan.
  */
class RollupRoutingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("aggregates over the base path are routed to the 1h rollup") {
    val dir = java.nio.file.Files.createTempDirectory("graft_route").toString
    val basePath = s"$dir/base"
    val rollupPath = s"$dir/rollup_1h"

    val base = (for {
      sym <- Seq("BTC", "ETH"); m <- 0 until 24 * 60
    } yield (sym, new Timestamp(ts("2024-03-01 00:00:00").getTime + m * 60000L),
      100.0 + (m * 13 % 31))).toDF("symbol", "t", "price")
    base.write.mode("overwrite").parquet(basePath)
    RollupStore.buildWithCarriers(
      spark.read.parquet(basePath), Seq("symbol"), "t", "price", "1 hour", rollupPath)

    RollupRouter.clear()
    RollupRouter.register(RollupRouter.Route(
      basePath, Seq("symbol"), "t", "price", Map(3600L -> rollupPath)))
    val rule = new RollupRouter.RouteRule(spark)
    spark.experimental.extraOptimizations = Seq(rule)
    try {
      val q = CandleOps.ohlcvRollup(
        spark.read.parquet(basePath), Seq("symbol"), "t", "price", "2 hours")
      val planFiles = q.queryExecution.executedPlan.toString()
      assert(planFiles.contains("rollup_1h"), s"expected routed scan, got:\n$planFiles")
      assert(!planFiles.contains("/base"), s"base still scanned:\n$planFiles")

      // routed result == unrouted ground truth
      spark.experimental.extraOptimizations = Nil
      val want = CandleOps.ohlcvRollup(
          spark.read.parquet(basePath), Seq("symbol"), "t", "price", "2 hours")
        .orderBy("symbol", "bucket_ts").collect()
      spark.experimental.extraOptimizations = Seq(rule)
      val got = q.orderBy("symbol", "bucket_ts").collect()
      assert(got.sameElements(want))
      assert(got.length == 24) // 2 symbols x 12 two-hour buckets
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouter.clear()
    }
  }

  private def routedFixture(tag: String): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_route_$tag").toString
    val basePath = s"$dir/base"
    val rollupPath = s"$dir/rollup_1h"
    val base = (for {
      sym <- Seq("BTC", "ETH"); m <- 0 until 24 * 60
    } yield (sym, new Timestamp(ts("2024-03-01 00:00:00").getTime + m * 60000L),
      100.0 + (m * 13 % 31))).toDF("symbol", "t", "price")
    base.write.mode("overwrite").parquet(basePath)
    RollupStore.buildWithCarriers(
      spark.read.parquet(basePath), Seq("symbol"), "t", "price", "1 hour", rollupPath)
    RollupRouter.clear()
    RollupRouter.register(RollupRouter.Route(
      basePath, Seq("symbol"), "t", "price", Map(3600L -> rollupPath)))
    spark.experimental.extraOptimizations = Seq(new RollupRouter.RouteRule(spark))
    (basePath, rollupPath)
  }

  private def teardownRouting(): Unit = {
    spark.experimental.extraOptimizations = Nil
    RollupRouter.clear()
  }

  /** Run `q` routed, assert the plan reads (or does not read) the
    * rollup, and compare to the unrouted ground truth.
    */
  private def assertRouted(
      q: org.apache.spark.sql.DataFrame,
      build: () => org.apache.spark.sql.DataFrame,
      expectRouted: Boolean
  ): Unit = {
    val plan = q.queryExecution.executedPlan.toString()
    if (expectRouted) {
      assert(plan.contains("rollup_1h"), s"expected routed scan, got:\n$plan")
      assert(!plan.contains("/base"), s"base still scanned:\n$plan")
    } else {
      assert(!plan.contains("rollup_1h"), s"unexpected routing:\n$plan")
    }
    val got = q.orderBy(q.columns.map(col): _*).collect()
    spark.experimental.extraOptimizations = Nil
    val want = build().orderBy(q.columns.map(col): _*).collect()
    spark.experimental.extraOptimizations = Seq(new RollupRouter.RouteRule(spark))
    assert(got.sameElements(want), s"routed result differs: got ${got.length} rows, want ${want.length}")
  }

  test("the multi-grain gap scan reads the rollup store, not the base table (G7 routing)") {
    // the reference's read-side quality loop scans rollup tables, not
    // raw candles (clickhouse_schema.py:167-206); here the SAME
    // GapOps.multiGrainGapScan code routes transparently: its finest
    // observedBuckets is a distinct over (keys, TimeBucket(ts)) — an
    // Aggregate with no agg functions — which the route rule rewrites
    // onto the materialized 1m-grain-compatible rollup scan.
    val dir = java.nio.file.Files.createTempDirectory("graft_route_gap").toString
    val basePath = s"$dir/base"
    val rollupPath = s"$dir/rollup_1h"
    // per-minute candles with real holes: BTC loses hours 5-6 (a 2h
    // run), ETH loses hour 20 (1h run, invisible at the 4h grain)
    val base = (for {
      sym <- Seq("BTC", "ETH"); m <- 0 until 24 * 60
      h = m / 60
      if !(sym == "BTC" && (h == 5 || h == 6)) && !(sym == "ETH" && h == 20)
    } yield (sym, new Timestamp(ts("2024-03-01 00:00:00").getTime + m * 60000L),
      100.0 + (m * 13 % 31))).toDF("symbol", "t", "price")
    base.write.mode("overwrite").parquet(basePath)
    RollupStore.buildWithCarriers(
      spark.read.parquet(basePath), Seq("symbol"), "t", "price", "1 hour", rollupPath)
    RollupRouter.clear()
    RollupRouter.register(RollupRouter.Route(
      basePath, Seq("symbol"), "t", "price", Map(3600L -> rollupPath)))
    val rule = new RollupRouter.RouteRule(spark)
    spark.experimental.extraOptimizations = Seq(rule)
    try {
      val grains = Seq("1h", "2h", "4h").map(graft.model.Timeframe.parse)
      def scan() = graft.operators.GapOps.multiGrainGapScan(
        spark.read.parquet(basePath), Seq("symbol"), "t", grains)
      val routed = scan()
      val plan = routed.queryExecution.executedPlan.toString()
      assert(plan.contains("rollup_1h"), s"expected routed scan, got:\n$plan")
      assert(!plan.contains("/base"), s"base still scanned:\n$plan")
      val got = routed.collect().map(_.toString).toSet
      spark.experimental.extraOptimizations = Nil
      val want = scan().collect().map(_.toString).toSet
      assert(got == want)
      // the planted holes are found: BTC 2h run at 1h grain, its 1-run
      // collapse at 2h; ETH's single hour only at the 1h grain
      assert(got.exists(_.contains("[BTC,1h,2024-03-01 05:00:00")), got.toString)
      assert(got.exists(_.contains("[ETH,1h,2024-03-01 20:00:00")), got.toString)
      assert(got.nonEmpty && want.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouter.clear()
    }
  }

  test("a fresh session rebuilds routes from store manifests (restart recovery)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_route_manifest").toString
    val basePath = s"$dir/base"
    val base = (for {
      sym <- Seq("BTC", "ETH"); m <- 0 until 24 * 60
    } yield (sym, new Timestamp(ts("2024-03-01 00:00:00").getTime + m * 60000L),
      100.0 + (m * 13 % 31))).toDF("symbol", "t", "price")
    base.write.mode("overwrite").parquet(basePath)
    // two grains built from the stored base — each drops a manifest
    RollupStore.buildWithCarriers(
      spark.read.parquet(basePath), Seq("symbol"), "t", "price",
      "15 minutes", s"$dir/rollup_15m")
    RollupStore.buildWithCarriers(
      spark.read.parquet(basePath), Seq("symbol"), "t", "price",
      "1 hour", s"$dir/rollup_1h")

    // "process restart": the in-memory table is gone...
    RollupRouter.clear()
    // ...and the store alone restores it
    val n = RollupRouter.registerFromStore(spark, dir)
    assert(n == 1, s"expected the two manifests to merge into one route, got $n")
    spark.experimental.extraOptimizations = Seq(new RollupRouter.RouteRule(spark))
    try {
      val q = CandleOps.ohlcvRollup(
        spark.read.parquet(basePath), Seq("symbol"), "t", "price", "2 hours")
      val plan = q.queryExecution.executedPlan.toString()
      assert(plan.contains("rollup_1h"), s"expected coarsest routed scan:\n$plan")
      assert(!plan.contains("/base"), s"base still scanned:\n$plan")
      // routed result == unrouted ground truth
      spark.experimental.extraOptimizations = Nil
      val want = CandleOps.ohlcvRollup(
          spark.read.parquet(basePath), Seq("symbol"), "t", "price", "2 hours")
        .orderBy("symbol", "bucket_ts").collect()
      spark.experimental.extraOptimizations = Seq(new RollupRouter.RouteRule(spark))
      assert(q.orderBy("symbol", "bucket_ts").collect().sameElements(want))
    } finally teardownRouting()
  }

  test("aligned half-open time-range filters route through to the rollup") {
    val (basePath, _) = routedFixture("range")
    try {
      def q() = CandleOps.ohlcvRollup(
        spark.read.parquet(basePath)
          .filter(col("t") >= lit("2024-03-01 06:00:00").cast("timestamp") &&
            col("t") < lit("2024-03-01 18:00:00").cast("timestamp")),
        Seq("symbol"), "t", "price", "2 hours")
      assertRouted(q(), () => q(), expectRouted = true)
      assert(q().count() == 12) // 2 symbols x 6 two-hour buckets
    } finally teardownRouting()
  }

  test("key filter combined with aligned range routes; unaligned bound does not") {
    val (basePath, _) = routedFixture("combo")
    try {
      def routed() = CandleOps.ohlcvRollup(
        spark.read.parquet(basePath)
          .filter(col("symbol") === "BTC" &&
            col("t") >= lit("2024-03-01 06:00:00").cast("timestamp")),
        Seq("symbol"), "t", "price", "1 hour")
      assertRouted(routed(), () => routed(), expectRouted = true)

      // 06:30 does not align to the 1h grain: bucket 06:00 would be
      // half-included -> must not route
      def unaligned() = CandleOps.ohlcvRollup(
        spark.read.parquet(basePath)
          .filter(col("t") >= lit("2024-03-01 06:30:00").cast("timestamp")),
        Seq("symbol"), "t", "price", "1 hour")
      assertRouted(unaligned(), () => unaligned(), expectRouted = false)
    } finally teardownRouting()
  }

  test("non-deterministic and subquery filters block routing (fail-safe)") {
    val (basePath, _) = routedFixture("unsafe")
    try {
      // selective non-deterministic filter: must not route (an
      // always-true rand() predicate gets eliminated by Spark itself
      // before routing, which is fine — this one survives)
      def nondet() = CandleOps.ohlcvRollup(
        spark.read.parquet(basePath).filter(rand(7) < 0.5),
        Seq("symbol"), "t", "price", "1 hour")
      assert(!nondet().queryExecution.executedPlan.toString().contains("rollup_1h"))

      spark.read.parquet(basePath).select("symbol").distinct()
        .createOrReplaceTempView("route_syms")
      def subq() = CandleOps.ohlcvRollup(
        spark.read.parquet(basePath)
          .filter(col("symbol").isin()
            || expr("symbol IN (SELECT symbol FROM route_syms)")),
        Seq("symbol"), "t", "price", "1 hour")
      assert(!subq().queryExecution.executedPlan.toString().contains("rollup_1h"))
      assert(subq().count() == 48) // still correct, just unrouted
    } finally teardownRouting()
  }

  test("HAVING over a routed aggregate still routes the scan") {
    val (basePath, _) = routedFixture("having")
    try {
      def q() = CandleOps.ohlcvRollup(
          spark.read.parquet(basePath), Seq("symbol"), "t", "price", "2 hours")
        .filter(col("trades") > 0 && col("high") >= 100.0)
      assertRouted(q(), () => q(), expectRouted = true)
      assert(q().count() == 24)
    } finally teardownRouting()
  }

  test("recent-N window rank over the base-table rollup routes to the rollup scan") {
    // the notebook shape (fetch_recent_ohlcv): per-key newest N buckets
    // of an OHLCV rollup — the reference picks the rollup TABLE by
    // hand; here the router must swap the scan under the window rank.
    val (basePath, _) = routedFixture("recentn")
    try {
      def q() = {
        val r = CandleOps.ohlcvRollup(
          spark.read.parquet(basePath), Seq("symbol"), "t", "price", "1 hour")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("symbol")).orderBy(col("bucket_ts").desc)
        r.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("symbol", "bucket_ts", "open", "high", "low", "close", "volume", "trades", "rn")
      }
      assertRouted(q(), () => q(), expectRouted = true)
      assert(q().count() == 10) // 2 symbols x 5 newest hourly buckets
    } finally teardownRouting()
  }

  test("recent-N with an aligned range filter below the rollup also routes") {
    val (basePath, _) = routedFixture("recentnf")
    try {
      def q() = {
        val r = CandleOps.ohlcvRollup(
          spark.read.parquet(basePath)
            .filter(col("t") >= lit("2024-03-01 04:00:00").cast("timestamp")),
          Seq("symbol"), "t", "price", "2 hours")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("symbol")).orderBy(col("bucket_ts").desc)
        r.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      }
      assertRouted(q(), () => q(), expectRouted = true)
      assert(q().count() == 6)
    } finally teardownRouting()
  }

  test("SQL date_trunc('hour'/'day') grouping routes like TimeBucket; week does not") {
    val (basePath, _) = routedFixture("trunc")
    try {
      def q(unit: String) = spark.read.parquet(basePath)
        .groupBy(col("symbol"), date_trunc(unit, col("t")).as("bucket_ts"))
        .agg(
          min_by(col("price"), col("t")).as("open"),
          max(col("price")).as("high"),
          min(col("price")).as("low"),
          max_by(col("price"), col("t")).as("close"),
          count(lit(1)).as("trades"))
      assertRouted(q("hour"), () => q("hour"), expectRouted = true)
      assert(q("hour").count() == 48)
      assertRouted(q("day"), () => q("day"), expectRouted = true)
      assert(q("day").count() == 2)
      // week truncation is not epoch-fixed-width — never routed
      assertRouted(q("week"), () => q("week"), expectRouted = false)
    } finally teardownRouting()
  }

  test("with multiple registered grains the coarsest sufficient one wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft_route_multi").toString
    val basePath = s"$dir/base"
    val r1h = s"$dir/rollup_1h"
    val r6h = s"$dir/rollup_6h"
    val base = (for {
      sym <- Seq("BTC", "ETH"); m <- 0 until 2 * 24 * 60
    } yield (sym, new Timestamp(ts("2024-03-01 00:00:00").getTime + m * 60000L),
      100.0 + (m * 13 % 31))).toDF("symbol", "t", "price")
    base.write.mode("overwrite").parquet(basePath)
    RollupStore.buildWithCarriers(
      spark.read.parquet(basePath), Seq("symbol"), "t", "price", "1 hour", r1h)
    RollupStore.buildWithCarriers(
      spark.read.parquet(basePath), Seq("symbol"), "t", "price", "6 hours", r6h)
    RollupRouter.clear()
    RollupRouter.register(RollupRouter.Route(
      basePath, Seq("symbol"), "t", "price",
      Map(3600L -> r1h, 21600L -> r6h)))
    spark.experimental.extraOptimizations = Seq(new RollupRouter.RouteRule(spark))
    try {
      // 1-day buckets: both grains divide, 6h must win (36x fewer rows)
      val daily = CandleOps.ohlcvRollup(
        spark.read.parquet(basePath), Seq("symbol"), "t", "price", "1 day")
      val dailyPlan = daily.queryExecution.executedPlan.toString()
      assert(dailyPlan.contains("rollup_6h"), s"expected 6h route:\n$dailyPlan")
      assert(daily.count() == 4) // 2 symbols x 2 days
      // 2-hour buckets: only 1h divides
      val two = CandleOps.ohlcvRollup(
        spark.read.parquet(basePath), Seq("symbol"), "t", "price", "2 hours")
      val twoPlan = two.queryExecution.executedPlan.toString()
      assert(twoPlan.contains("rollup_1h") && !twoPlan.contains("rollup_6h"),
        s"expected 1h route:\n$twoPlan")
      assert(two.count() == 48)
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouter.clear()
    }
  }

  test("non-divisible grains and unregistered paths are left alone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_route2").toString
    val basePath = s"$dir/base"
    val rollupPath = s"$dir/rollup_1h"
    val base = (0 until 600).map(m =>
      ("X", new Timestamp(ts("2024-03-01 00:00:00").getTime + m * 60000L), m.toDouble))
      .toDF("symbol", "t", "price")
    base.write.mode("overwrite").parquet(basePath)
    RollupStore.buildWithCarriers(
      spark.read.parquet(basePath), Seq("symbol"), "t", "price", "1 hour", rollupPath)
    RollupRouter.clear()
    RollupRouter.register(RollupRouter.Route(
      basePath, Seq("symbol"), "t", "price", Map(3600L -> rollupPath)))
    spark.experimental.extraOptimizations = Seq(new RollupRouter.RouteRule(spark))
    try {
      // 90 minutes is not a multiple of 1h -> must scan the base
      val q = CandleOps.ohlcvRollup(
        spark.read.parquet(basePath), Seq("symbol"), "t", "price", "90 minutes")
      assert(!q.queryExecution.executedPlan.toString().contains("rollup_1h"))
      assert(q.count() == 7) // 600 minutes / 90
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouter.clear()
    }
  }
}
