package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextOps, VectorOps}
import graft.operators.DedupGroups

/** Unit coverage for the round-4 corpus-budget operators: OOV rate
  * against a deterministic top-k vocabulary, training-window packing,
  * int8 quantization, and the SemDeDup composition (cosine pairs ->
  * connected components -> keepers).
  */
class PackOovQuantSpec extends SparkSpec {
  import spark.implicits._

  test("oovRate: known vocabulary coverage, ties broken by token") {
    // corpus counts: a=4, b=3, c=2, d=2, e=1 -> top-3 vocab {a, b, c}
    // (c beats d on the token tiebreak at equal count)
    val docs = Seq(
      (0L, "a a b c d"),
      (1L, "a b c d e"),
      (2L, "a b")
    ).toDF("doc_id", "text")
    val out = TextOps.oovRate(docs, "doc_id", "text", vocabSize = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 5L, 1L, 0.2))) // d is OOV
    assert(out(1L) == ((1L, 5L, 2L, 0.4))) // d, e OOV
    assert(out(2L) == ((2L, 2L, 0L, 0.0)))
  }

  test("oovRate: full vocabulary means zero OOV everywhere") {
    val docs = Seq((0L, "x y"), (1L, "y z")).toDF("doc_id", "text")
    val rates = TextOps.oovRate(docs, "doc_id", "text", vocabSize = 10)
      .select("oov_rate").as[Double].collect()
    assert(rates.forall(_ == 0.0))
  }

  test("packSequences: offsets accumulate in id order and docs straddle windows") {
    // group g: doc 0 has 3 tokens, doc 1 has 4, doc 2 has 2; capacity 4
    // stream: [0,3) | [3,7) | [7,9) -> doc 1 straddles windows 0 and 1,
    // doc 2 sits fully in window 1
    val docs = Seq(
      (0L, "t t t", "g"),
      (1L, "t t t t", "g"),
      (2L, "t t", "g"),
      (3L, "t t t t t", "h") // separate shard restarts at offset 0
    ).toDF("doc_id", "text", "source")
    val out = TextOps.packSequences(docs, "doc_id", "text", "source", capacity = 4L)
      .select("doc_id", "tok_start", "win_first", "win_last")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 0L, 0L, 0L)))
    assert(out(1L) == ((1L, 3L, 0L, 1L))) // straddles the cut at 4
    assert(out(2L) == ((2L, 7L, 1L, 2L))) // tokens 7,8: windows 1 then 2
    assert(out(3L) == ((3L, 0L, 0L, 1L))) // fresh shard, fresh offsets
  }

  test("quantizeInt8Stats: max|x| maps to ±127, zero vector degrades to zeros") {
    val emb = Seq(
      (0L, Array(2.0f, -4.0f, 1.0f)), // scale = 4/127; codes 64, -127, 32
      (1L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = VectorOps.quantizeInt8Stats(emb, "vec_id", "embedding")
      .as[(Long, Double, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val (_, scale, qMin, qMax, qSum) = out(0L)
    assert(math.abs(scale - 4.0 / 127.0) < 1e-15)
    assert(qMin == -127L && qMax == 64L)
    // floor(2.0/(4/127) + 0.5) = floor(64.0) = 64; floor(1.0/(4/127)+0.5) = 32
    assert(qSum == 64L - 127L + 32L)
    assert(out(1L) == ((1L, 0.0, 0L, 0L, 0L)))
    // codes stay inside int8 range by construction
    assert(qMin >= -127L && qMax <= 127L)
  }

  test("sourceMixRates: weighted allocation, capped at 1 when budget exceeds supply") {
    val docs = Seq(
      (0L, "a b c d e", "srcA"), (1L, "a b c d e", "srcA"), // 10 tokens
      (2L, "a b c d e f g h i j", "srcB"), // 10 tokens
      (3L, "a b", "srcC") // 2 tokens
    ).toDF("doc_id", "text", "source")
    val out = TextOps.sourceMixRates(docs, "doc_id", "text", "source",
        weights = Seq("srcA" -> 0.5, "srcB" -> 0.25), defaultWeight = 0.25,
        budgetTokens = 16L)
      .as[(String, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("srcA") == (("srcA", 2L, 10L, 8.0, 0.8)))
    assert(out("srcB") == (("srcB", 1L, 10L, 4.0, 0.4)))
    assert(out("srcC") == (("srcC", 1L, 2L, 4.0, 1.0))) // capped: 4 > 2 available
  }

  test("round-4 ops are partition-invariant (bit-identical under repartitioning)") {
    val docs = (0L until 120L)
      .map(i => (i, s"tok${i % 7} tok${i % 3} tok${i % 11} common word", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    for (parts <- Seq(1, 13)) {
      val d = docs.repartition(parts)
      assert(canon(TextOps.oovRate(d, "doc_id", "text", 5)) ==
        canon(TextOps.oovRate(docs, "doc_id", "text", 5)))
      assert(canon(TextOps.packSequences(d, "doc_id", "text", "source", 16L)) ==
        canon(TextOps.packSequences(docs, "doc_id", "text", "source", 16L)))
      assert(canon(TextOps.sourceMixRates(d, "doc_id", "text", "source",
          Seq("src0" -> 0.5), 0.1, 1000L)) ==
        canon(TextOps.sourceMixRates(docs, "doc_id", "text", "source",
          Seq("src0" -> 0.5), 0.1, 1000L)))
    }
  }

  test("oovRate plan: vocabulary membership is a broadcast join, not a shuffle of tokens") {
    val docs = (0L until 50L).map(i => (i, s"a b c tok$i")).toDF("doc_id", "text")
    val plan = TextOps.oovRate(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast membership join in:\n$plan")
  }

  test("semantic dedup composition: cosine pairs resolve to component keepers") {
    // cluster 0: vectors 1,2,3 mutually near-identical (chain at least);
    // vector 9 orthogonal. cluster 1: 5 alone.
    val emb = Seq(
      (1L, Array(1.0f, 0.01f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f, 0.01f), 0),
      (3L, Array(0.99f, 0.01f, 0.01f), 0),
      (9L, Array(0.0f, 1.0f, 0.0f), 0),
      (5L, Array(0.5f, 0.5f, 0.5f), 1)
    ).toDF("vec_id", "embedding", "label")
    val pairs = VectorOps.cosineNearDupPairs(emb, "vec_id", "embedding", "label", 0.9)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val out = DedupGroups.resolveKeepers(emb, "vec_id", pairs)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1L, true)))
    assert(out(2L) == ((2L, 1L, false)))
    assert(out(3L) == ((3L, 1L, false)))
    assert(out(9L) == ((9L, 9L, true))) // orthogonal: its own keeper
    assert(out(5L) == ((5L, 5L, true))) // other cluster never pairs
  }
}
