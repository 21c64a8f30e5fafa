package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** The IR/counting trio added in round 4: corpus n-gram counts, BM25
  * ranked retrieval (raw-odds idf), and the frozen linear quality
  * classifier. Each is checked against a hand-computed toy case and
  * for partition invariance (bit-identical results under repartition).
  */
class IrOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c a b c"),   // trigrams: "a b c" x2, "b c a", "c a b"
    (2L, "a b c d"),
    (3L, "x y"),           // shorter than n=3: contributes nothing
    (4L, "")
  ).toDF("doc_id", "text")

  test("ngramCounts counts grams across docs with cutoff and tie-broken top-k") {
    val got = TextOps.ngramCounts(docs, "doc_id", "text", n = 3, minCount = 2L, k = 10)
      .as[(String, Long, Long)].collect().toList
    // "a b c": doc1 twice + doc2 once = 3 occurrences in 2 docs; all
    // other grams occur once and fall under the cutoff
    assert(got == List(("a b c", 2L, 3L)))
  }

  test("ngramCounts is partition-invariant") {
    val a = TextOps.ngramCounts(docs, "doc_id", "text", 2, 1L, 100)
      .collect().toSet
    val b = TextOps.ngramCounts(docs.repartition(7), "doc_id", "text", 2, 1L, 100)
      .collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("bm25TopK matches the hand-computed raw-odds formula") {
    val corpus = Seq(
      (1L, "x x y z"),
      (2L, "x q q q"),
      (3L, "q q q q")
    ).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(corpus, "doc_id", "text", Seq("x"), k = 3)
      .as[(Long, Double, Long)].collect().toList
    // N=3, avgdl=4, dl=4 for all => length norm = 1 - b + b*dl/avgdl = 1
    // df(x)=2, idf = (3 - 2 + 0.5) / 2.5 = 0.6
    // doc1 tf=2: 0.6 * (2*2.2) / (2 + 1.2) = 2.64/3.2 = 0.825
    // doc2 tf=1: 0.6 * 2.2 / 2.2 = 0.6
    assert(got.map(_._1) == List(1L, 2L))
    assert(math.abs(got.head._2 - 0.825) < 1e-12)
    assert(math.abs(got(1)._2 - 0.6) < 1e-12)
    assert(got.forall(_._3 == 1L))
  }

  test("bm25TopK rank order is stable under repartitioning") {
    val a = TextOps.bm25TopK(docs, "doc_id", "text", Seq("a", "b"), k = 4)
      .as[(Long, Double, Long)].collect().toList
    val b = TextOps.bm25TopK(docs.repartition(5), "doc_id", "text", Seq("a", "b"), k = 4)
      .as[(Long, Double, Long)].collect().toList
    assert(a == b && a.nonEmpty)
  }

  test("linearQualityScore margin is an exact dyadic sum (order-independent)") {
    val many = (1L to 200L)
      .map(i => (i, Seq.fill((i % 17).toInt + 1)(s"tok${i % 23}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = TextOps.linearQualityScore(many, "doc_id", "text", dim = 16)
      .as[(Long, Double, Boolean, Long)].collect().sortBy(_._1).toList
    val b = TextOps.linearQualityScore(many.repartition(11), "doc_id", "text", dim = 16)
      .as[(Long, Double, Boolean, Long)].collect().sortBy(_._1).toList
    // exact equality on the doubles, not approx: dyadic margins must be
    // bit-identical whatever the partitioning
    assert(a == b && a.nonEmpty)
    assert(a.forall { case (_, margin, keep, _) => keep == (margin > 0.0) })
    // weights are quarters, so every margin is a multiple of 0.25
    assert(a.forall { case (_, m, _, _) => (m * 4.0) == math.rint(m * 4.0) })
  }

  test("plan shapes: top-k is TakeOrdered, bm25 stats broadcast, linear model joins nothing") {
    val gramPlan = TextOps.ngramCounts(docs, "doc_id", "text", 3, 2L, 10)
      .queryExecution.executedPlan.toString()
    assert(gramPlan.contains("TakeOrderedAndProject"),
      s"gram top-k should plan as TakeOrdered, never a global sort:\n$gramPlan")

    val bmPlan = TextOps.bm25TopK(docs, "doc_id", "text", Seq("a", "b"), k = 5)
      .queryExecution.executedPlan.toString()
    assert(bmPlan.contains("BroadcastHashJoin"),
      s"df stats must broadcast onto the tf frame:\n$bmPlan")
    assert(bmPlan.contains("TakeOrderedAndProject"),
      s"bm25 top-k should plan as TakeOrdered:\n$bmPlan")
    assert(!bmPlan.contains("SortMergeJoin"),
      s"nothing in bm25 should shuffle-join (stats are term-table-sized):\n$bmPlan")

    val linPlan = TextOps.linearQualityScore(docs, "doc_id", "text", dim = 16)
      .queryExecution.executedPlan.toString()
    assert(!linPlan.contains("Join"),
      s"the frozen model is a projection — no weight-table join:\n$linPlan")
  }

  test("cdcChunks: lossless reassembly, bounded cuts, zero shuffle") {
    val corpus = (1L to 60L)
      .map(i => (i, (0 until 40).map(j => s"t${(i * 7 + j * 13) % 29}").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextOps.cdcChunks(corpus, "doc_id", "text", w = 4, modulus = 8)
    val re = chunks.orderBy("doc_id", "chunk_idx")
      .groupBy("doc_id")
      .agg(array_join(collect_list(col("chunk_text")), " ").as("re"))
      .as[(Long, String)].collect().toMap
    val want = corpus.as[(Long, String)].collect().toMap
    assert(re == want, "chunks must reassemble to the original text")

    val plan = chunks.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"chunking is a row-local projection — no shuffle:\n$plan")
  }

  test("cdcChunks boundaries are shift-robust: suffix chunks survive a head edit") {
    val original = (0 until 200).map(j => s"w${(j * 17) % 31}").mkString(" ")
    val edited = "inserted tokens at the head " + original
    val two = Seq((1L, original), (2L, edited)).toDF("doc_id", "text")
    val hashes = TextOps.cdcChunks(two, "doc_id", "text", w = 4, modulus = 8)
      .select("doc_id", "chunk_hash")
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val shared = hashes(1L).intersect(hashes(2L))
    // a fixed-block scheme would share nothing after a 5-token shift;
    // content-defined boundaries realign, so most suffix chunks match
    assert(shared.size >= hashes(1L).size / 2,
      s"expected most of doc1's ${hashes(1L).size} chunks to survive the head edit, shared=${shared.size}")
  }

  test("cdcChunks handles docs shorter than the window as one chunk") {
    val small = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val got = TextOps.cdcChunks(small, "doc_id", "text", w = 5, modulus = 4)
      .as[(Long, Long, String, Long, String)].collect().toList.sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._5)) == List((1L, 0L, "a b"), (2L, 0L, "")))
  }

  test("phraseSearch finds exact occurrences, overlaps, and repeated-token phrases") {
    val corpus = Seq(
      (1L, "x a b a b y"),    // "a b" at 1 and 3
      (2L, "a a a"),          // "a a" at 0 and 1 (overlapping)
      (3L, "b a"),            // reversed — no "a b"
      (4L, "")
    ).toDF("doc_id", "text")
    val ab = TextOps.phraseSearch(corpus, "doc_id", "text", Seq("a", "b"))
      .as[(Long, Long)].collect().toSet
    assert(ab == Set((1L, 1L), (1L, 3L)))
    val aa = TextOps.phraseSearch(corpus, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long)].collect().toSet
    assert(aa == Set((2L, 0L), (2L, 1L)))
    val aba = TextOps.phraseSearch(corpus, "doc_id", "text", Seq("a", "b", "a"))
      .as[(Long, Long)].collect().toSet
    assert(aba == Set((1L, 1L)))
    // the pushed isin keeps non-phrase terms out of the exchange
    val plan = TextOps.phraseSearch(corpus, "doc_id", "text", Seq("a", "b"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("isin") || plan.contains("IN ("),
      s"term filter should appear in the plan:\n$plan")
  }

  test("curriculumBins fills n-tiles ANSI-style and is partition-invariant") {
    val rows = (1L to 23L).map(i => (i, if (i % 2 == 0) "a" else "b", (i * 7 % 13).toDouble))
      .toDF("doc_id", "source", "score")
    val got = TextOps.curriculumBins(rows, "doc_id", "source", "score", nBins = 4)
      .as[(Long, String, Double, Long)].collect()
    // per stratum: first (n mod bins) bins get the extra row
    val bySrc = got.groupBy(_._2)
    assert(bySrc("a").length == 11 && bySrc("b").length == 12)
    val sizesA = bySrc("a").groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizesA == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 2))
    // bin order follows score order within the stratum
    bySrc.values.foreach { rs =>
      val sorted = rs.sortBy(r => (r._3, r._1))
      assert(sorted.map(_._4).toList == sorted.map(_._4).toList.sorted)
    }
    val re = TextOps.curriculumBins(rows.repartition(9), "doc_id", "source", "score", 4)
      .as[(Long, String, Double, Long)].collect().sortBy(_._1)
    assert(re.sameElements(got.sortBy(_._1)))
  }

  test("linearQualityScore matches a manual single-doc computation") {
    val one = Seq((7L, "hello world hello")).toDF("doc_id", "text")
    val got = TextOps.linearQualityScore(one, "doc_id", "text", dim = 8)
      .as[(Long, Double, Boolean, Long)].collect().head
    def bucket(tok: String, dim: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(4)
      val v = h.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      ((v % dim) + dim) % dim
    }
    def weight(b: Long): Double = ((bucket2(s"w$b") % 7 + 7) % 7 - 3) / 4.0
    def bucket2(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)
      h.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val bh = bucket("hello", 8); val bw = bucket("world", 8)
    val expected =
      (if (bh == bw) 3.0 * weight(bh)
       else 2.0 * weight(bh) + 1.0 * weight(bw)) - 0.25
    assert(got._1 == 7L && got._2 == expected && got._4 == 3L)
  }

  test("rarityScore charges floor(log2(frequency rank)) bits per token") {
    val d = Seq(
      (1L, "the the cat"),
      (2L, "the dog")
    ).toDF("doc_id", "text")
    val got = TextOps.rarityScore(d, "doc_id", "text")
      .select("doc_id", "n_tokens", "surprisal_bits", "mean_bits")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // vocab ranks: the=1 (0 bits), cat=2 (1 bit), dog=3 (1 bit)
    assert(got == Seq((1L, 3L, 1L, 1.0 / 3.0), (2L, 2L, 1L, 0.5)))
  }

  test("clusterTopTerms ranks cluster tf x corpus idf with term tiebreak") {
    val d = Seq((1L, "apple apple banana"), (2L, "apple cherry"))
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 0), (2L, 1)).toDF("doc_id", "cluster")
    val got = TextOps.clusterTopTerms(d, clusters, "doc_id", "text", k = 5)
      .select("cluster", "term", "tf", "df", "score", "rank")
      .as[(Int, String, Long, Long, Double, Int)]
      .collect().sortBy(t => (t._1, t._6)).toSeq
    assert(got == Seq(
      (0, "apple", 2L, 2L, 2.0, 1),   // 2 * (2/2), tie with banana
      (0, "banana", 1L, 1L, 2.0, 2),  // broken by term asc
      (1, "cherry", 1L, 1L, 2.0, 1),
      (1, "apple", 1L, 2L, 1.0, 2)))
  }

  test("corpusCard reports exact totals, unique hashes and ratios per source/lang") {
    val d = Seq(
      (1L, "x y", "en", "web", 3L),
      (2L, "x y", "en", "web", 3L),
      (3L, "z", "en", "web", 1L),
      (4L, "", "de", "web", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.corpusCard(d)
      .select("source", "lang", "n_docs", "total_chars", "total_tokens",
        "n_unique", "mean_tokens", "dup_ratio")
      .as[(String, String, Long, Long, Long, Long, Double, Double)]
      .collect().sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      ("web", "de", 1L, 0L, 0L, 1L, 0.0, 0.0),
      ("web", "en", 3L, 7L, 5L, 2L, 5.0 / 3.0, 1.0 / 3.0)))
  }
}
