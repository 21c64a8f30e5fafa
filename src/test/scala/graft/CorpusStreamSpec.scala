package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.CorpusStream

case class RawDoc(doc_id: Long, t: Timestamp, text: String)

/** Streaming corpus ingest: quality gates run stateless-first, exact
  * content dedup is stateful first-writer-wins within the watermark.
  */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("gates drop short/repetitive docs; dedup state drops cross-batch repeats") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[RawDoc]
    val out = CorpusStream.cleanIngest(
      source.toDF(), "doc_id", "text", "t",
      watermark = "10 minutes", minTokens = 3, maxDupTokenRatio = 0.5)
    val q = out.writeStream
      .outputMode("append").format("memory").queryName("corpus_out").start()
    try {
      source.addData(
        RawDoc(1L, ts("2024-03-01 08:00:00"), "alpha beta gamma delta"),
        RawDoc(3L, ts("2024-03-01 08:00:20"), "tiny"),
        RawDoc(4L, ts("2024-03-01 08:00:30"), "spam spam spam spam spam x"))
      q.processAllAvailable()
      source.addData(
        RawDoc(5L, ts("2024-03-01 08:01:00"), "alpha beta gamma delta"),
        RawDoc(6L, ts("2024-03-01 08:01:10"), "epsilon zeta eta theta"))
      q.processAllAvailable()
      val got = spark.table("corpus_out")
      val ids = got.select("doc_id").as[Long].collect().toSet
      // 3 fails minTokens, 4 fails dup-ratio (4/6 > 0.5), 5 is a
      // cross-batch exact dup of 1 still inside the watermark
      assert(ids == Set(1L, 6L))
      // rejected rows never reached the state store output; kept rows
      // carry the bounded dedup key, not just the text
      assert(got.columns.toSet ==
        Set("doc_id", "t", "content_hash", "n_tokens", "text"))
    } finally q.stop()
  }

  test("cdcIngest emits only novel chunks: a re-crawl's unedited suffix dedups away") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[RawDoc]
    val out = CorpusStream.cdcIngest(
      source.toDF(), "doc_id", "text", "t",
      watermark = "10 minutes", w = 3, modulus = 4)
    val q = out.writeStream
      .outputMode("append").format("memory").queryName("cdc_out").start()
    try {
      val body = (0 until 60).map(j => s"w${(j * 17) % 31}").mkString(" ")
      source.addData(RawDoc(1L, ts("2024-03-01 08:00:00"), body))
      q.processAllAvailable()
      val firstChunks = spark.table("cdc_out")
        .select("chunk_hash").as[String].collect().toSet
      assert(firstChunks.size >= 3, s"expected several chunks, got $firstChunks")

      // re-crawl with a head edit: only the re-chunked prefix is novel
      source.addData(RawDoc(2L, ts("2024-03-01 08:01:00"), "edited head " + body))
      q.processAllAvailable()
      val second = spark.table("cdc_out")
        .filter($"doc_id" === 2L).select("chunk_hash").as[String].collect().toSet
      assert(second.nonEmpty, "the edited prefix must come through as novel chunks")
      assert(second.intersect(firstChunks).isEmpty,
        "chunks already in state must not re-emit")
      // the stream saw doc 2's unedited suffix but deduped it: fewer
      // novel chunks than the doc has chunks in total
      val allDoc2 = graft.functions.TextOps.cdcChunks(
          Seq((2L, "edited head " + body)).toDF("doc_id", "text"),
          "doc_id", "text", w = 3, modulus = 4)
        .select("chunk_hash").as[String].collect().toSet
      assert(second.size < allDoc2.size,
        s"suffix chunks should have deduped: novel=${second.size} total=${allDoc2.size}")
    } finally q.stop()
  }
}
