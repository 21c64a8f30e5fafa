package graft

import org.apache.spark.sql.functions._

import graft.api.CorpusTable

/** The corpus facade: the full chain drops exactly the planted junk
  * and lands partitioned on disk.
  */
class CorpusTableSpec extends SparkSpec {
  import spark.implicits._

  test("full chain: redact, dedup, near-dup, gate, split, write") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away tonight again"
    val docs = Seq(
      (1L, base, "en"),
      (2L, base, "en"),                                  // exact dup of 1
      (3L, base.replace("tonight", "today"), "en"),      // near-dup of 1
      (4L, "reach me at alice@example.com for details about the offer we discussed", "en"),
      (5L, "short", "en"),                               // gated: under minTokens
      (6L, "completely different content about catalyst optimizer rules and physical planning", "de")
    ).toDF("doc_id", "text", "lang")

    val dir = java.nio.file.Files.createTempDirectory("graft_ct").toString
    CorpusTable(docs)
      .redacted
      .dedupedExact
      .withoutNearDups()
      .gated(minTokens = 6)
      .split(Seq("train" -> 0.5, "val" -> 0.5))
      .write(dir, Seq("split"), maxRecordsPerFile = 100L)

    val back = spark.read.parquet(dir)
    val ids = back.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 4L, 6L)) // 2 exact-dup gone, 3 near-dup gone, 5 gated
    val redactedText = back.filter($"doc_id" === 4L).select("text").as[String].head()
    assert(redactedText.contains("<EMAIL>") && !redactedText.contains("alice@"))
    assert(back.columns.contains("split") && back.columns.contains("lang"))
  }

  test("gatedQuality drops symbol soup and pure repetition, keeps prose") {
    val docs = Seq(
      (1L, "a perfectly normal sentence with ordinary words and structure here"),
      (2L, "$$$ ### @@@ %%% ^^^ &&& *** $$$ ### @@@ %%% ^^^"),  // symbol soup
      (3L, "spam ham " * 400)                                   // compresses to ~nothing
    ).toDF("doc_id", "text")
    val kept = CorpusTable(docs).gatedQuality()
      .df.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }
}
