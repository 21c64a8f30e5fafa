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

  test("sampledToBudget matches explicit stratifiedSample at the computed rates") {
    val docs = (0L until 200L)
      .map(i => (i, ("tok " * (5 + (i % 5).toInt)).trim, s"src${i % 2}"))
      .toDF("doc_id", "text", "source")
    val viaFacade = CorpusTable(docs)
      .sampledToBudget("source", Seq("src0" -> 0.7, "src1" -> 0.3),
        defaultWeight = 0.0, budgetTokens = 400L)
      .df.select("doc_id").as[Long].collect().toSet
    // explicit path: read the rates, sample with them as literals
    val rates = graft.functions.TextOps.sourceMixRates(
        docs, "doc_id", "text", "source",
        Seq("src0" -> 0.7, "src1" -> 0.3), 0.0, 400L)
      .select("source", "rate").as[(String, Double)].collect().toSeq
    val viaLiterals = graft.functions.TextOps.stratifiedSample(
        docs, "doc_id", "source", rates, 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(viaFacade == viaLiterals && viaFacade.nonEmpty)
  }

  test("temperatureMixRates: exact sqrt-micro weights; flattening oversamples small sources") {
    // src0: 160 docs x 10 tokens = 1600; src1: 40 docs x 10 = 400
    val docs = (0L until 200L)
      .map(i => (i, ("tok " * 10).trim, if (i < 160) "src0" else "src1"))
      .toDF("doc_id", "text", "source")
    val got = graft.functions.TextOps
      .temperatureMixRates(docs, "doc_id", "text", "source",
        budgetTokens = 1000L)
      .select("source", "n_tokens", "weight_micro", "rate")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // weight_micro = floor(sqrt(n_tokens) * 1e6), exactly
    assert(got("src0")._3 == math.floor(math.sqrt(1600.0) * 1e6).toLong)
    assert(got("src1")._3 == math.floor(math.sqrt(400.0) * 1e6).toLong)
    // temperature flattening: the 4x-larger source gets only 2x the
    // weight, so the smaller source's RATE (kept fraction) is higher
    val r0 = got("src0")._4
    val r1 = got("src1")._4
    assert(r1 > r0, s"small source not oversampled: src0=$r0 src1=$r1")
    // rate = budget * w / (wsum * n_tokens), capped at 1
    val wsum = got("src0")._3 + got("src1")._3
    assert(r0 == math.min(1.0,
      (BigDecimal(1000L) * BigDecimal(got("src0")._3)).toDouble /
        (BigDecimal(wsum) * BigDecimal(1600L)).toDouble))
  }

  test("sampledByWeight delegates to weightedSample") {
    val docs = (0L until 200L)
      .map(i => (i, "tok tok tok", 1L + i % 100))
      .toDF("doc_id", "text", "w")
    val viaFacade = CorpusTable(docs).sampledByWeight("w", 100L, 0.8)
      .df.select("doc_id").as[Long].collect().toSet
    val direct = graft.functions.TextOps.weightedSample(docs, "doc_id",
        col("w"), 100L, 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(viaFacade == direct && viaFacade.nonEmpty)
  }

  test("withOovRate and packed join their columns onto the corpus") {
    val docs = Seq(
      (0L, "a a b", "g"), (1L, "a b c", "g"), (2L, "x y z", "h")
    ).toDF("doc_id", "text", "source")
    val t = CorpusTable(docs).withOovRate(vocabSize = 2).packed("source", 4L)
    val row = t.df.filter($"doc_id" === 1L).head()
    assert(t.df.count() == 3)
    assert(row.getAs[Long]("n_oov") >= 1L) // c is outside the top-2 vocab
    assert(row.getAs[Long]("tok_start") == 3L) // after doc 0's three tokens
    assert(t.df.columns.count(_ == "text") == 1) // no duplicated columns
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

  test("rarity/card/clusterTopics facade delegates run with their contracts") {
    val docs = Seq(
      (1L, "alpha alpha beta", "en", "web", 16L),
      (2L, "alpha gamma", "en", "web", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val t = CorpusTable(docs)
    assert(t.rarityScores.columns.contains("mean_bits") && t.rarityScores.count() == 2)
    val card = t.card.select("n_docs", "n_unique").as[(Long, Long)].head()
    assert(card == ((2L, 2L)))
    val clusters = Seq((1L, 0), (2L, 0)).toDF("doc_id", "cluster")
    assert(t.clusterTopics(clusters, k = 2).count() == 2)
    assert(t.noveltyScores().columns.contains("novelty"))
    assert(t.fluencyScores.columns.contains("mean_fluency_milli")
      && t.fluencyScores.count() == 2)
  }
}
