package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.NearDupStream

case class StreamDoc(doc_id: Long, t: Timestamp, text: String)

/** Streaming near-dup: arriving docs pair against per-bucket LSH
  * state, never against the whole corpus; the bucket cap bounds both
  * state and emissions.
  */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
  private val nearDup = base.replace("green", "dark")
  private val unrelated =
    "completely different content about catalyst optimizer rules and physical plan execution strategies"

  test("near-dups pair across batches; unrelated docs never pair") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamDoc]
    val pairs = NearDupStream.candidatePairs(
      source.toDF(), "doc_id", "text", "t",
      watermark = "10 minutes", bands = 4, shingleSize = 3,
      bucketCap = 100, stateHorizonMs = 3600000L)
    val q = pairs.writeStream
      .outputMode("append").format("memory").queryName("neardup_out").start()
    try {
      source.addData(
        StreamDoc(1L, ts("2024-03-01 08:00:00"), base),
        StreamDoc(2L, ts("2024-03-01 08:00:05"), unrelated))
      q.processAllAvailable()
      val afterFirst = spark.table("neardup_out")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(afterFirst.isEmpty) // nothing to pair with yet

      // the near-dup arrives a batch later: pairs against STATE, and
      // an exact dup pairs against both prior members of its buckets
      source.addData(StreamDoc(3L, ts("2024-03-01 08:01:00"), nearDup))
      q.processAllAvailable()
      source.addData(StreamDoc(4L, ts("2024-03-01 08:02:00"), base))
      q.processAllAvailable()
      val got = spark.table("neardup_out")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 3L))) // near-dup caught from state
      assert(got.contains((1L, 4L))) // exact dup: all bands collide
      assert(got.contains((3L, 4L)))
      assert(!got.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated never pairs
    } finally q.stop()
  }

  test("bucketCap bounds emissions: a flooded bucket stops pairing") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamDoc]
    val pairs = NearDupStream.candidatePairs(
      source.toDF(), "doc_id", "text", "t",
      watermark = "10 minutes", bands = 4, shingleSize = 3,
      bucketCap = 3, stateHorizonMs = 3600000L)
    val q = pairs.writeStream
      .outputMode("append").format("memory").queryName("neardup_cap").start()
    try {
      // 10 exact copies: unbounded this would emit C(10,2)*bands rows;
      // with cap 3 each band bucket holds 3 docs -> C(3,2)=3 pairs/band
      source.addData((1L to 10L).map(i =>
        StreamDoc(i, ts(f"2024-03-01 08:00:${i}%02d"), base)))
      q.processAllAvailable()
      val n = spark.table("neardup_cap").count()
      assert(n == 3L * 4L, s"expected 12 capped emissions, got $n")
      val distinctPairs = spark.table("neardup_cap")
        .select("doc_a", "doc_b").distinct().count()
      assert(distinctPairs == 3L) // the 3 pairs among the first 3 members
    } finally q.stop()
  }
}
