package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RollupRouter
import org.apache.spark.sql.types.DecimalType

import graft.operators.{CandleOps, RollupStore}

/** Migration path for pre-cents rollup stores: a legacy store carries
  * DECIMAL `volume_dec` instead of the exact long `vol_cents` carrier,
  * so the RollupRouter warns once and never routes it (silently-stale
  * acceleration would be worse). `RollupStore.rebuildCarriers` is the
  * warned store's actionable remedy: rebuild from the base table named
  * in the store's own manifest, re-register, route again — exact.
  */
class CarrierMigrationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val ticks: Seq[Tick] = for {
    sym <- Seq("BTC", "ETH")
    h <- 0 until 4
    m <- 0 until 60
  } yield Tick(sym, ts(f"2024-05-01 $h%02d:$m%02d:00"),
    (if (sym == "BTC") 100.0 else 10.0) + ((h * 60 + m) * 7 % 13) * 0.01)

  test("warned volume_dec store: unroutable -> rebuildCarriers -> routes bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_migrate").toString
    val basePath = s"$dir/base"
    val storePath = s"$dir/rollup"
    ticks.toDF().write.mode("overwrite").parquet(basePath)
    val base = spark.read.parquet(basePath)

    // forge the legacy layout: the modern carrier rollup with
    // vol_cents swapped for the pre-round-9 DECIMAL(18,2) volume_dec,
    // plus the store's route manifest (legacy builds wrote one too)
    CandleOps.ohlcvRollup(base, Seq("symbol"), "t", "price", "15 minutes",
        withCarriers = true)
      .withColumn("volume_dec",
        (col("vol_cents") / lit(100)).cast(DecimalType(18, 2)))
      .drop("vol_cents")
      .withColumn("bucket_month", date_format(col("bucket_ts"), "yyyyMM"))
      .write.mode("overwrite").partitionBy("bucket_month").parquet(storePath)
    RollupRouter.writeManifest(
      spark, basePath, Seq("symbol"), "t", "price", 900L, storePath)

    def routedPlan(): (String, Array[org.apache.spark.sql.Row]) = {
      val q = CandleOps.ohlcvRollup(base, Seq("symbol"), "t", "price", "1 hour")
      (q.queryExecution.executedPlan.toString(),
        q.orderBy("symbol", "bucket_ts").collect())
    }

    RollupRouter.clear()
    assert(RollupRouter.registerFromStore(spark, dir) == 1)
    spark.experimental.extraOptimizations = Seq(new RollupRouter.RouteRule(spark))
    try {
      // pre-migration: registered but NEVER routed (missing vol_cents)
      val (legacyPlan, legacyRows) = routedPlan()
      assert(!legacyPlan.contains("/rollup"),
        s"a volume_dec store must not route:\n$legacyPlan")

      assert(RollupStore.rebuildCarriers(spark, storePath),
        "legacy store must report rebuilt")
      val cols = spark.read.parquet(storePath).columns.toSet
      assert(cols.contains("vol_cents") && !cols.contains("volume_dec"))

      // rebuildCarriers re-registered the route itself: now it routes,
      // and the routed answer is bit-identical to the base rollup
      val (migratedPlan, migratedRows) = routedPlan()
      assert(migratedPlan.contains("/rollup"),
        s"migrated store must route:\n$migratedPlan")
      assert(!migratedPlan.contains("/base"), s"base still scanned:\n$migratedPlan")
      assert(migratedRows.sameElements(legacyRows),
        "migration must not change query results")

      // second call is a no-op: already carries vol_cents
      assert(!RollupStore.rebuildCarriers(spark, storePath))
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouter.clear()
    }
  }

  test("rebuildCarriers on a manifest-less legacy store refuses (nothing safe to rebuild from)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_migrate_nm").toString
    Seq(("BTC", ts("2024-05-01 00:00:00"), Timestamp.valueOf("2024-05-01 00:00:00"),
        Timestamp.valueOf("2024-05-01 00:14:00"), 1.0, 2.0, 0.5, 1.5, 3L))
      .toDF("symbol", "bucket_ts", "open_ts", "close_ts", "open", "high", "low", "close", "trades")
      .withColumn("volume_dec", lit(12.34).cast(DecimalType(18, 2)))
      .withColumn("bucket_month", lit("202405"))
      .write.mode("overwrite").partitionBy("bucket_month").parquet(s"$dir/rollup")
    assert(!RollupStore.rebuildCarriers(spark, s"$dir/rollup"))
    // and the store is untouched
    assert(spark.read.parquet(s"$dir/rollup").columns.contains("volume_dec"))
  }
}
