package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.MicrostructureOps
import graft.streaming.ToxicityStream
import graft.streaming.ToxicityStream.Bar

/** Streaming VPIN: closed volume buckets must equal the batch
  * operator's report minus each key's final (still-open) bucket,
  * regardless of how the bar stream is sliced into micro-batches.
  */
class ToxicityStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // two keys, deterministic prices/volumes; bucketVolume 300 cents
  private val bars: Seq[Bar] = {
    def series(sym: String, mul: Int) = (0 until 14).map { i =>
      val close = 10000L + mul * (if (i % 3 == 0) 40L * i else -25L * i)
      Bar(sym, ts(f"2024-03-01 ${i}%02d:00:00"), close, 80L + 15L * (i % 4))
    }
    series("A", 1) ++ series("B", -2)
  }

  private def batchClosed(): Set[(String, Long, Long, Long, Long)] = {
    // run the batch operator on the equivalent rollup frame, then drop
    // each key's last (still-open) bucket
    val df = bars.map(b => (b.symbol, b.bucket_ts,
      b.closeCents / 100.0, b.volumeCents / 100.0))
      .toDF("sym", "bucket_ts", "close", "volume")
    val all = MicrostructureOps.vpin(df, Seq("sym"), "bucket_ts", 300L)
      .select("sym", "vol_bucket", "n_bars", "imbalance_cents", "total_cents")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val lastPerKey = all.groupBy(_._1).map { case (k, xs) =>
      k -> xs.map(_._2).max }
    all.filterNot(r => lastPerKey(r._1) == r._2).toSet
  }

  test("closed stream buckets equal batch minus the open tail, across micro-batch slicings") {
    implicit val sqlCtx = spark.sqlContext
    val want = batchClosed()
    assert(want.nonEmpty, "fixture must close at least one bucket")
    for (splitAt <- Seq(5, 13, 21)) {
      val source = MemoryStream[Bar]
      val out = ToxicityStream.toxicity(source.toDS(), bucketVolumeCents = 300L)
      val name = s"tox_out_$splitAt"
      val q = out.writeStream
        .outputMode("append").format("memory").queryName(name).start()
      try {
        val (first, rest) = bars.partition(b =>
          bars.indexOf(b) < splitAt) // keys interleave across the split
        source.addData(first: _*)
        q.processAllAvailable()
        source.addData(rest: _*)
        q.processAllAvailable()
        val got = spark.table(name)
          .select("symbol", "vol_bucket", "n_bars", "imbalance_cents", "total_cents")
          .as[(String, Long, Long, Long, Long)].collect().toSet
        assert(got == want, s"splitAt=$splitAt")
      } finally q.stop()
    }
  }

  test("toxicity_bps is the same one division the batch operator publishes") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Bar]
    val out = ToxicityStream.toxicity(source.toDS(), bucketVolumeCents = 300L)
    val q = out.writeStream
      .outputMode("append").format("memory").queryName("tox_div").start()
    try {
      source.addData(bars: _*)
      q.processAllAvailable()
      val rows = spark.table("tox_div")
        .select("imbalance_cents", "total_cents", "toxicity_bps")
        .as[(Long, Long, Double)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (imb, tot, bps) =>
        assert(bps == imb.toDouble * 10000 / tot.toDouble)
      }
    } finally q.stop()
  }
}
