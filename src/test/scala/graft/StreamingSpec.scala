package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CandleOps
import graft.streaming.StreamingRollup

case class Tick(symbol: String, t: Timestamp, price: Double)

/** M5: the streaming rollup must agree with the batch rollup on
  * identical input (SURVEY.md §5 "Streaming tests").
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val ticks: Seq[Tick] = for {
    sym <- Seq("BTC", "ETH")
    m <- 0 until 60
  } yield Tick(sym, ts(f"2024-03-01 08:$m%02d:00"),
    (if (sym == "BTC") 100.0 else 10.0) + (m * 7 % 13))

  test("streaming windowed OHLCV (append mode) equals batch rollup") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Tick]
    val streamed = StreamingRollup.streamingOhlcv(
      source.toDF(), Seq("symbol"), "t", "price", "15 minutes", "10 minutes")

    val q = streamed.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("rollup_out")
      .start()
    try {
      source.addData(ticks)
      q.processAllAvailable()
      // advance the event-time watermark past the last window so append
      // mode finalizes every bucket
      source.addData(Tick("BTC", ts("2024-03-01 12:00:00"), 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("rollup_out")
      .filter($"bucket_ts" < ts("2024-03-01 09:00:00"))
      .select("symbol", "bucket_ts", "open", "high", "low", "close", "volume", "trades")
      .orderBy("symbol", "bucket_ts")
      .collect()
    val want = CandleOps.ohlcvRollup(
        ticks.toDF(), Seq("symbol"), "t", "price", "15 minutes")
      .select("symbol", "bucket_ts", "open", "high", "low", "close", "volume", "trades")
      .orderBy("symbol", "bucket_ts")
      .collect()
    assert(got.length == 8) // 2 symbols x 4 windows, all finalized
    assert(got.sameElements(want))
  }

  test("streaming parquet sink writes month-partitioned rollups") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val source = MemoryStream[Tick]
    val streamed = StreamingRollup.streamingOhlcv(
      source.toDF(), Seq("symbol"), "t", "price", "15 minutes", "10 minutes")
    source.addData(ticks)
    source.addData(Tick("BTC", ts("2024-03-01 12:00:00"), 1.0))
    val writer = StreamingRollup.toParquetSink(streamed, s"$dir/rollup", s"$dir/ckpt")
    StreamingRollup.runAvailableNow(writer)

    val stored = spark.read.parquet(s"$dir/rollup")
    assert(stored.filter($"bucket_month" === "202403").count() >= 8)
    assert(stored.columns.contains("bucket_month"))
  }
}
