package graft

import graft.functions.Bpe
import graft.functions.Bpe.Merge

/** BPE trainer/encoder: hand-computed merges on a tiny corpus, and
  * equivalence of the distributed trainer with a sequential reference
  * implementation (same lexicographic tie-break) on randomized text.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the hand-computable merge table; encode applies it greedily") {
    val docs = Seq((1L, "aa ab aa"), (2L, "ab aa")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", nMerges = 4)
    // pair (a,a) occurs 3x (in the three "aa"), (a,b) 2x
    assert(merges == Seq(Merge(0, "a", "a"), Merge(1, "a", "b")))

    val counts = Bpe.tokenCounts(
        Seq((1L, "aab aa b aaab")).toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    // aab -> [aa, b] (2), aa -> [aa] (1), b -> [b] (1),
    // aaab -> [a,a,a,b] -> [aa,a,b] -> [aa,ab] (2)
    assert(counts(1L) == 6L)
  }

  test("distributed trainer equals a sequential reference on randomized corpora") {
    def seqTrain(words0: Map[String, Long], nMerges: Int): Seq[Merge] = {
      var words = words0.map { case (w, f) => (w.map(_.toString): Seq[String], f) }.toSeq
      val out = Seq.newBuilder[Merge]
      var rank = 0
      var done = false
      while (rank < nMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- words; Seq(l, r) <- syms.sliding(2) if syms.length > 1)
          counts((l, r)) = counts.getOrElse((l, r), 0L) + f
        val best = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.headOption.filter(_._2 >= 2L)
        best match {
          case None => done = true
          case Some(((l, r), _)) =>
            out += Merge(rank, l, r)
            words = words.map { case (s, f) =>
              (graft.functions.Bpe.mergeOnce(s, l, r), f)
            }
            rank += 1
        }
      }
      out.result()
    }

    val rnd = new scala.util.Random(11)
    val alphabet = "abcd"
    for (trial <- 0 until 3) {
      val texts = (0 until 40).map { i =>
        (i.toLong, (0 until 12).map(_ =>
          (0 until (1 + rnd.nextInt(5))).map(_ =>
            alphabet(rnd.nextInt(alphabet.length))).mkString).mkString(" "))
      }
      val docs = texts.toDF("doc_id", "text")
      val wordFreqs = texts.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = Bpe.train(docs, "text", nMerges = 8)
      val want = seqTrain(wordFreqs, 8)
      assert(got == want, s"trial $trial: $got vs $want")
      // partition-independence: the merge table is a pure function of
      // the corpus, not of its physical layout
      assert(Bpe.train(docs.repartition(13), "text", nMerges = 8) == got)
    }
  }

  test("pinned merge table: engine encode equals the closed-form oracle on overlap traps") {
    // q_bpe_pinned's oracle computes tokens = non-ws chars − Σ pattern
    // occurrences; this must equal the REAL greedy encode under the
    // pinned table. Fixtures cover the proof's edge cases: run overlaps
    // (ththe, thththe), chain formation (the), near-misses where the
    // chain must NOT fire (tthhe: th forms but no e follows), and
    // cross-group adjacency (inou, asin).
    val merges = Seq(Merge(0, "t", "h"), Merge(1, "th", "e"),
      Merge(2, "i", "n"), Merge(3, "o", "u"), Merge(4, "a", "s"))
    val texts = Seq(
      (0L, "the ththe thththe"),
      (1L, "tthhe theth ethe"),
      (2L, "inou asin ouas inin"),
      (3L, "plain words without patterns xyz qqq"),
      (4L, "This Mixes CASE and the chain THE"),
      (5L, ""))
    def occ(s: String, p: String): Int = {
      var n = 0; var i = s.indexOf(p)
      while (i >= 0) { n += 1; i = s.indexOf(p, i + p.length) }
      n
    }
    val expected = texts.map { case (id, raw) =>
      val t = raw.toLowerCase(java.util.Locale.ROOT)
      val nonWs = t.count(!_.isWhitespace)
      id -> (nonWs - Seq("th", "the", "in", "ou", "as").map(occ(t, _)).sum).toLong
    }.toMap
    val got = Bpe.tokenCounts(texts.toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    assert(got == expected, s"$got vs $expected")
  }
}
