package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Codecs
import graft.operators.CandleOps
import graft.sources.Tables

/** Dev measurement main (not part of the query surface): bytes/value
  * of the per-column codecs over real per-key hourly series, vs the
  * 8-byte raw baseline — the numbers PERF.md cites for the
  * CODEC(DoubleDelta)/CODEC(Gorilla) adjudication.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.CodecStats"
  */
object CodecStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(new org.apache.spark.SparkConf().setAll(Tables.ReaderConfs))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r1h = CandleOps.ohlcvRollup(
      Tables.events(spark, sfDir), Seq("user_id"), "ts", "value", "1 hour")
    val packed = r1h
      .select(col("user_id"), unix_micros(col("bucket_ts")).as("us"), col("close"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("us"), col("close")))).as("s"))
      .select(
        size(col("s")).cast(LongType).as("n"),
        length(Codecs.dd_encode(expr("transform(s, x -> x.us)"))).cast(LongType).as("dd"),
        length(Codecs.gorilla_encode(expr("transform(s, x -> x.close)"))).cast(LongType).as("gor"),
        // the engine's own storage discipline: prices as cent longs —
        // DoubleDelta over the cent series is the relevant price codec
        length(Codecs.dd_encode(
          expr("transform(s, x -> CAST(round(x.close * 100) AS BIGINT))")))
          .cast(LongType).as("ddc"))
    val row = packed.agg(
      sum(col("n")).as("n"), sum(col("dd")).as("dd"), sum(col("gor")).as("gor"),
      sum(col("ddc")).as("ddc"))
      .head()
    val (n, dd, gor, ddc) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    println(f"values=$n raw=${8L * n} ddTsBytes=$dd (${dd * 1.0 / n}%.2f B/val, " +
      f"${8.0 * n / dd}%.1fx) gorillaPxBytes=$gor (${gor * 1.0 / n}%.2f B/val, " +
      f"${8.0 * n / gor}%.1fx) ddCentPxBytes=$ddc (${ddc * 1.0 / n}%.2f B/val, " +
      f"${8.0 * n / ddc}%.1fx)")
    spark.stop()
  }
}
