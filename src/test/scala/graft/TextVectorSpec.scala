package graft

import org.apache.spark.sql.functions._

import graft.functions.{SimHash64, TextOps, VectorOps}

/** Planted-duplicate tests for the dedup/similarity family: the small-
  * data correctness the oracle can't see (sf0.01 has no near-dups).
  */
class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
  private val nearDup = base.replace("green", "dark") // one-token edit
  private val distinct1 =
    "completely different content about spark catalyst optimizer rules and physical plan execution strategies"
  private val distinct2 =
    "unrelated text mentioning parquet columnar storage compression encodings and predicate pushdown mechanics"

  private lazy val docs = Seq(
    (0L, base), (1L, nearDup), (2L, distinct1), (3L, distinct2), (4L, base)
  ).toDF("doc_id", "text")

  test("exactDedupGroups groups identical texts under the min doc_id") {
    val g = TextOps.exactDedupGroups(docs, "doc_id", "text")
    assert(g.count() == 4) // 0 and 4 collapse
    val dupGroup = g.filter($"n_copies" === 2).head()
    assert(dupGroup.getAs[Long]("keeper_id") == 0L)
  }

  test("shingles handles short docs (no descending-sequence bug)") {
    val short = Seq((0L, "one two"), (1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val out = short.select(TextOps.shingles(TextOps.tokens($"text"), 3).as("s"))
      .select(size($"s")).as[Int].collect().toSeq
    assert(out == Seq(0, 1, 0))
  }

  test("minhash LSH finds the exact dup and the near-dup, not the distinct docs") {
    val pairs = TextOps.minhashCandidatePairs(docs, "doc_id", "text",
        bands = 4, rowsPerBand = 2, shingleSize = 3)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 4L))) // identical text: all bands collide
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 4L))) // near-dup caught
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L || p._1 == 3L || p._2 == 3L))
  }

  test("minhashEstimateVsExact: exact dup estimates 1.0 with zero error") {
    val out = TextOps.minhashEstimateVsExact(docs, "doc_id", "text",
        bands = 4, rowsPerBand = 2, shingleSize = 3)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // docs 0 and 4 are identical: every signature component matches
    // and the exact Jaccard is 1.0, so the estimator error is exactly 0
    val (est, exact, err) = out((0L, 4L))
    assert(est == 1.0 && exact == 1.0 && err == 0.0)
    // every reported error is |est - exact| and within [0, 1]
    assert(out.values.forall { case (e, x, d) =>
      d == math.abs(e - x) && d >= 0.0 && d <= 1.0 })
  }

  test("ngramJaccard: identity = 1.0, near-dup high, distinct = 0") {
    val pairs = Seq((0L, 4L), (0L, 1L), (0L, 2L)).toDF("doc_a", "doc_b")
    val j = TextOps.ngramJaccard(docs, "doc_id", "text", pairs, shingleSize = 3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((0L, 4L)) == 1.0)
    assert(j((0L, 1L)) > 0.5 && j((0L, 1L)) < 1.0)
    assert(j((0L, 2L)) == 0.0)
  }

  test("ngramJaccard salted join is bit-identical to unsalted at salt 2 and 8") {
    // a hot doc_a (doc 0 in every pair) — the skew shape salting fixes
    val corpus = (0L until 30L).map(i => (i, s"$base tail token $i")).toDF("doc_id", "text")
    val pairs = (1L until 30L).map(b => (0L, b)).toDF("doc_a", "doc_b")
    def run(salt: Int) = TextOps.ngramJaccard(corpus, "doc_id", "text", pairs, 3, salt)
      .as[(Long, Long, Double)].collect().toSet
    val plain = run(1)
    assert(plain.size == 29)
    assert(run(2) == plain)
    assert(run(8) == plain)
  }

  test("simhash: identical docs hamming 0, near-dups close, distinct far") {
    val fp = docs.select($"doc_id",
      SimHash64.simhash64(TextOps.tokens($"text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(0L), fp(4L)) == 0)
    assert(hamming(fp(0L), fp(1L)) < 16)
    assert(hamming(fp(0L), fp(2L)) > 16)
  }

  test("simhash tokenHash64 equals unsigned parse of first 16 md5 hex chars") {
    // the contract the SQL oracle depends on
    val tok = "hello"
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    assert(SimHash64.tokenHash64(tok) == java.lang.Long.parseUnsignedLong(hex, 16))
  }

  test("minhash signature stage plans as a pure projection (no Exchange)") {
    val plan = TextOps.minhashSignatures(docs, "doc_id", "text", 8, 3)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"signature stage shuffles:\n$plan")
  }

  test("simhashNearDupPairs surfaces the planted exact dup") {
    val pairs = TextOps.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 4L)))
    assert(pairs.contains((0L, 1L))) // near-dup: multi-band recall
  }

  test("simhash 4-band recall: every hamming<=3 pair is a candidate regardless of bit position") {
    // identical docs => hamming 0; the multi-band guarantee is about
    // WHICH band differing bits land in, so check pairs via raw
    // fingerprints: for every pair of docs in a larger corpus whose
    // hamming is <= 3, simhashNearDupPairs must emit it.
    val corpus = (0L until 40L).map(i =>
      (i, s"shared common prefix tokens ${"x" * (i % 5).toInt} tail $i variant ${i % 7}"))
      .toDF("doc_id", "text")
    val fps = corpus.select($"doc_id",
      SimHash64.simhash64(TextOps.tokens($"text")).as("sh")).as[(Long, Long)].collect()
    val expected = (for {
      (a, sa) <- fps; (b, sb) <- fps if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val got = TextOps.simhashNearDupPairs(corpus, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("simhashCrossPairs flags new docs near a standing corpus, not novel ones") {
    val known = Seq((0L, base), (1L, distinct1)).toDF("doc_id", "text")
    val fresh = Seq(
      (100L, base),       // exact dup of known doc 0 -> hamming 0
      (101L, distinct2)   // novel
    ).toDF("doc_id", "text")
    val got = TextOps.simhashCrossPairs(fresh, "doc_id", "text",
        known, "doc_id", "text", maxHamming = 3)
      .select("new_id", "known_id", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((100L, 0L, 0L)))
    assert(!got.exists(_._1 == 101L))
  }

  test("simhash bucket cap drops a planted hot band bucket") {
    // 50 identical docs -> every band bucket has 50 members; with a cap
    // below 50 the hot buckets are dropped and no pairs survive, while
    // an uncapped run returns all 50*49/2 pairs.
    val hot = (0L until 50L).map(i => (i, base)).toDF("doc_id", "text")
    val uncapped = TextOps.simhashNearDupPairs(hot, "doc_id", "text", 3)
    assert(uncapped.count() == 50L * 49 / 2)
    val capped = TextOps.simhashNearDupPairs(hot, "doc_id", "text", 3, bucketCap = 49L)
    assert(capped.count() == 0)
  }

  test("minhash bucket cap drops a planted hot band bucket, keeps normal pairs") {
    // 50 identical docs share every band bucket (size 50); two near-dup
    // docs occupy small buckets. Capping below 50 kills the quadratic
    // hot buckets but must keep the ordinary near-dup pair.
    val hot = (0L until 50L).map(i => (i, distinct1)) :+
      (100L, base) :+ (101L, nearDup)
    val corpus = hot.toDF("doc_id", "text")
    val uncapped = TextOps.minhashCandidatePairs(corpus, "doc_id", "text", 4, 2, 3)
    assert(uncapped.filter($"doc_a" < 100).count() == 50L * 49 / 2)
    val capped = TextOps.minhashCandidatePairs(corpus, "doc_id", "text", 4, 2, 3,
      bucketCap = 49L).as[(Long, Long)].collect().toSet
    assert(!capped.exists(p => p._1 < 100L))
    assert(capped.contains((100L, 101L)))
  }

  test("winnowing bucket cap drops a planted hot fingerprint bucket, keeps normal pairs") {
    val hot = (0L until 50L).map(i => (i, distinct1)) :+
      (100L, base) :+ (101L, base)
    val corpus = hot.toDF("doc_id", "text")
    val uncapped = graft.functions.Winnowing.winnowNearDupPairs(
      corpus, "doc_id", "text", k = 4, w = 4, minShared = 2)
    assert(uncapped.filter($"doc_a" < 100).count() == 50L * 49 / 2)
    val capped = graft.functions.Winnowing.winnowNearDupPairs(
      corpus, "doc_id", "text", k = 4, w = 4, minShared = 2, bucketCap = 49L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists(p => p._1 < 100L))
    assert(capped.contains((100L, 101L)))
  }

  test("repetitionStats flags repeated content and leaves clean text alone") {
    val d = Seq(
      (1L, "a a a a a a"),
      (2L, "unique words only here"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionStats(d, "doc_id", "text")
      .select("doc_id", "n_tokens", "dup_token_ratio", "top_bigram_n", "top_bigram_frac")
      .as[(Long, Long, Option[Double], Option[Long], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((6L, Some(5.0 / 6), Some(5L), Some(1.0))))
    assert(got(2L) == ((4L, Some(0.0), Some(1L), Some(1.0 / 3))))
    assert(got(3L) == ((1L, Some(0.0), None, None))) // no bigrams
  }

  test("TextSignals expression equals the column-composition formulation") {
    import org.apache.spark.sql.types.DoubleType
    // a corpus exercising every code path: bullets, ellipses (incl.
    // runs of 4-6 dots), unicode … and •, hashes, whitespace tails,
    // empty/whitespace-only docs, no-alpha docs, multi-space gaps
    val d = ((0L until 40L).map(i =>
      (i, s"doc $i with some words ${"#" * (i % 4).toInt} trailing ${"." * (i % 7).toInt}")) ++ Seq(
      (100L, ""), (101L, "   "), (102L, "123 456 !!!"),
      (103L, "- a\n* b\n• c\nd ...\ne …  \n...mid... end"),
      (104L, "a  b   c"), (105L, "....... ### ..")
    )).toDF("doc_id", "text")
    val viaExpr = TextOps.gopherQualitySignals(d, "doc_id", "text")
    // the original column formulation, verbatim
    val t = col("text")
    def ratio(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den === 0, lit(null).cast(DoubleType))
        .otherwise(num.cast(DoubleType) / den.cast(DoubleType))
    val words = TextOps.tokens(t)
    val lines = split(t, "\n")
    val viaCols = d.select(
      col("doc_id"),
      ratio(length(regexp_replace(trim(t), " ", "")), size(words)).as("mean_word_len"),
      ratio(size(filter(words, w => w.rlike("[A-Za-z]"))), size(words)).as("frac_alpha_words"),
      ratio(length(t) - length(regexp_replace(t, "#", "")) +
        (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3, size(words)).as("symbol_word_ratio"),
      ratio(size(filter(lines, l => l.rlike("^\\s*[-*•]"))), size(lines)).as("bullet_line_frac"),
      ratio(size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))), size(lines)).as("ellipsis_line_frac"))
    val a = viaExpr.orderBy("doc_id").collect()
    val b = viaCols.orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("gopherQualitySignals: planted bullets, ellipses, and symbol-only docs") {
    val d = Seq(
      (1L, "- item one\n- item two\nplain line..."),
      (2L, "123 456 !!!")
    ).toDF("doc_id", "text")
    val got = TextOps.gopherQualitySignals(d, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Double]("bullet_line_frac") == 2.0 / 3)
    assert(got(1L).getAs[Double]("ellipsis_line_frac") == 1.0 / 3)
    assert(got(2L).getAs[Double]("frac_alpha_words") == 0.0)
    assert(got(2L).getAs[Double]("mean_word_len") == 3.0)
    assert(got(2L).getAs[Double]("symbol_word_ratio") == 0.0)
  }

  test("redactPii masks planted emails and long digit runs") {
    val d = Seq((1L, "contact bob@example.com or call 12345678901 now; short 123 stays"))
      .toDF("doc_id", "text")
    val out = d.select(TextOps.redactPii($"text")).as[String].head()
    assert(out == "contact <EMAIL> or call <NUM> now; short 123 stays")
  }

  test("splitAssign is deterministic and proportional") {
    val ids = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val counts = ids.select(TextOps.splitAssign($"id", splits).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000L)
    assert(counts("train") > 1700 && counts("train") < 1890)
    assert(counts("val") > 60 && counts("val") < 140)
    assert(counts("test") > 60 && counts("test") < 140)
    // repartitioning cannot change an id's assignment
    val a = ids.select($"id", TextOps.splitAssign($"id", splits).as("s"))
      .as[(Long, String)].collect().toMap
    val b = ids.repartition(13).select($"id", TextOps.splitAssign($"id", splits).as("s"))
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("dot/norm/knn: planted nearest vector wins") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.1f, 0.0f), 0),  // nearest to 0
      (2L, Array(0.0f, 1.0f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f, 1.0f), 1)    // other cluster
    ).toDF("vec_id", "embedding", "label")
    val d = vecs.filter($"vec_id" === 0).select(
      VectorOps.dot($"embedding", $"embedding").as("d")).as[Double].head()
    assert(d == 1.0)
    val knn = VectorOps.knnTopK(vecs, "vec_id", "embedding", $"vec_id" === 0, k = 2)
      .orderBy("rank").as[(Long, Long, Int)].collect()
    assert(knn.map(_._2).toSeq == Seq(1L, 2L))
    // IVF: same-cluster only → vec 3 never a candidate for query 0
    val ivf = VectorOps.knnTopKIvf(vecs, "vec_id", "embedding", "label",
      $"vec_id" === 0, k = 3).as[(Long, Long, Int)].collect()
    assert(!ivf.map(_._2).contains(3L))
    // near-dup threshold
    val nd = VectorOps.cosineNearDupPairs(vecs, "vec_id", "embedding", "label", 0.9)
      .as[(Long, Long)].collect().toSet
    assert(nd == Set((0L, 1L)))
  }

  test("cosineNearDupPairs sub-shards a planted mega-cluster: pairs == uncapped") {
    import graft.functions.VectorOps
    // cluster 0: 6 mutually-identical vectors (a planted degenerate
    // cluster — through r12 the cap DROPPED it and its 15 pairs);
    // cluster 1: one near-dup pair. The r13 blocked path splits
    // cluster 0 into ceil(6/5)=2 shards and recovers every pair.
    val mega = (0L to 5L).map(i => (i, Array(1.0f, 0f, 0f), 0))
    val small = Seq((10L, Array(0f, 1.0f, 0f), 1), (11L, Array(0f, 0.99f, 0.1f), 1))
    val vecs = (mega ++ small).toDF("vec_id", "embedding", "label")
    val uncapped = VectorOps.cosineNearDupPairs(
        vecs, "vec_id", "embedding", "label", 0.9, clusterCap = 0L)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.size == 16)
    val blocked = VectorOps.cosineNearDupPairs(
        vecs, "vec_id", "embedding", "label", 0.9, clusterCap = 5L)
      .as[(Long, Long)].collect().toSet
    assert(blocked == uncapped,
      s"blocked path must recover the capped path's dropped pairs: $blocked")
  }

  test("blocked cosine pair join is a sort-merge over the block key (hint holds)") {
    import graft.functions.VectorOps
    // Catalyst would broadcast the whole vector side when the size
    // estimate allows — which bypasses the task-size bound (67 s vs
    // 11.4 s at sf3). The MERGE hint must survive into the plan.
    val vecs = (0L to 30L).map(i => (i, Array(1.0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val plan = VectorOps.cosineNearDupPairs(
      vecs, "vec_id", "embedding", "label", 0.9, clusterCap = 5L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      "blocked pair join must stay a sort-merge join")
  }

  test("blocked cosine pairs == uncapped for every block size (planted over-cap)") {
    import graft.functions.VectorOps
    // 3 replica families of 20 near-identical vectors + 30 noise
    // vectors, all in ONE cluster (the duplicate-dense sf10 shape):
    // every block size from deep-split to single-block must produce
    // the identical exact pair set — each unordered pair exactly once
    val rnd = new scala.util.Random(7)
    def fam(base: Array[Float], idOff: Long) = (0 until 20).map { i =>
      val v = base.clone(); v(0) = v(0) + i * 1e-4f
      (idOff + i, v, 0)
    }
    val noise = (0 until 30).map { i =>
      (1000L + i, Array.fill(8)(rnd.nextGaussian().toFloat), 0)
    }
    val vecs = (fam(Array(1f, 0, 0, 0, 0, 0, 0, 0), 0L) ++
      fam(Array(0, 1f, 0, 0, 0, 0, 0, 0), 100L) ++
      fam(Array(0, 0, 1f, 0, 0, 0, 0, 0), 200L) ++ noise)
      .toDF("vec_id", "embedding", "label")
    val expect = VectorOps.cosineNearDupPairs(
        vecs, "vec_id", "embedding", "label", 0.98, clusterCap = 0L)
      .as[(Long, Long)].collect().toSet
    assert(expect.size >= 3 * 190, s"families must pair: ${expect.size}")
    for (cap <- Seq(1L, 7L, 13L, 90L, 100000L)) {
      val got = VectorOps.cosineNearDupPairs(
          vecs, "vec_id", "embedding", "label", 0.98, clusterCap = cap)
        .as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"cap=$cap emitted a pair twice")
      assert(got.toSet == expect, s"cap=$cap pair set diverged")
    }
    // and the LSH wrapper inherits exactness under tiny caps
    val lshFree = VectorOps.lshNearDupPairs(
        vecs, "vec_id", "embedding", dim = 8, nPlanes = 2,
        threshold = 0.98, clusterCap = 0L)
      .as[(Long, Long)].collect().toSet
    val lshBlocked = VectorOps.lshNearDupPairs(
        vecs, "vec_id", "embedding", dim = 8, nPlanes = 2,
        threshold = 0.98, clusterCap = 5L)
      .as[(Long, Long)].collect().toSet
    assert(lshBlocked == lshFree)
  }

  test("cosineNearDupPairs raises by design past the comparisons budget") {
    import graft.functions.VectorOps
    // 10 identical vectors in one cluster: the exact all-pairs
    // contract costs 45 comparisons — past a planted budget of 10 the
    // builder must refuse to LAUNCH (pre-flight, from the size frame,
    // before the quadratic join plans), carrying the by-design marker
    // so blind drivers (Bench) classify it as a skip, and pointing at
    // the gauge + the linear group-only route.
    val vecs = (0L to 9L).map(i => (i, Array(1.0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalStateException] {
      VectorOps.cosineNearDupPairs(vecs, "vec_id", "embedding", "label", 0.9,
        clusterCap = 5L, maxComparisons = 10L)
    }
    assert(e.getMessage.contains(graft.api.Guards.Marker))
    assert(e.getMessage.contains("45"))
    assert(e.getMessage.contains("clusterCapReport"))
    assert(e.getMessage.contains("minhashStarEdges"))
    // the budget is a launch guard, not a semantic knob: disabled
    // (<= 0) or raised, the same input yields the full exact pair set
    val ok = VectorOps.cosineNearDupPairs(vecs, "vec_id", "embedding", "label",
      0.9, clusterCap = 5L, maxComparisons = 0L).count()
    assert(ok == 45L)
    val raised = VectorOps.cosineNearDupPairs(vecs, "vec_id", "embedding", "label",
      0.9, clusterCap = 5L, maxComparisons = 45L).count()
    assert(raised == 45L)
  }

  test("under-cap clusters skip the shard machinery (no merge pin)") {
    import graft.functions.VectorOps
    // when NO cluster exceeds the cap AND the bill is small the
    // operator must degenerate to a plain within-cluster self-join:
    // no SortMergeJoin pin (Catalyst may broadcast), and no
    // shard/explode columns in the plan — the r13 unconditional pin
    // taxed exactly these small-scale inputs
    val vecs = (0L to 30L).map(i => (i, Array(1.0f, 0f, 0f), i % 8))
      .toDF("vec_id", "embedding", "label")
    val plan = VectorOps.cosineNearDupPairs(
      vecs, "vec_id", "embedding", "label", 0.9, clusterCap = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"under-cap input must not pay the sort-merge pin:\n$plan")
    assert(!plan.contains("explode"),
      s"under-cap input must not build shard explodes:\n$plan")
  }

  test("a dense under-cap clustering pins MERGE without shard machinery") {
    import graft.functions.VectorOps
    // the sf3 shape (re-measured r14): the worst cluster is UNDER the
    // cap but the bill is past mergePinMinComparisons — unpinned,
    // Catalyst broadcast the whole vector side and walked one giant
    // per-cluster hash chain (4.5x slower). The plan must sort-merge
    // but still skip the shard explodes (m = 1 everywhere).
    val vecs = (0L to 30L).map(i => (i, Array(1.0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val plan = VectorOps.cosineNearDupPairs(
      vecs, "vec_id", "embedding", "label", 0.9, clusterCap = 100L,
      mergePinMinComparisons = 100L) // bill = 31*30/2 = 465 > 100
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"dense under-cap input must pay the sort-merge pin:\n$plan")
    assert(!plan.contains("explode"),
      s"under-cap input must not build shard explodes:\n$plan")
  }

  test("multi-probe IVF recovers the boundary neighbor single-probe misses") {
    import graft.functions.VectorOps
    val vecs = Seq(
      (0L, Array(1.0f, 0.05f, 0f), 0),  // query, assigned cluster 0
      (1L, Array(0.95f, 0.3f, 0f), 1),  // true nearest, but in cluster 1
      (2L, Array(0.0f, 1.0f, 0f), 1),
      (3L, Array(0.8f, -0.6f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val cents = Seq((0, Array(1.0, -0.1, 0.0)), (1, Array(0.5, 0.85, 0.0)))
      .toDF("cluster", "centroid")
    def top1(nprobe: Int) = VectorOps.knnTopKIvfProbe(
        vecs, "vec_id", "embedding", "label", cents, $"vec_id" === 0, k = 1, nprobe)
      .select("neighbor_id").as[Long].head()
    assert(top1(1) == 3L) // only cluster 0 probed
    assert(top1(2) == 1L) // boundary neighbor recovered
  }

  test("topk_items: exact when capacity suffices, space-saving guarantees under eviction") {
    import graft.functions.TopKItems
    // exact regime across many partitions: merge must preserve counts
    val items = (1 to 100).flatMap(i => Seq.fill(i % 7 + 1)(s"u$i"))
    val df = items.toDF("u").repartition(8)
    val got = df.agg(TopKItems.topk_items($"u", 5, 1024).as("t"))
      .select(explode($"t").as("x"))
      .select($"x.item", $"x.cnt", $"x.err")
      .as[(String, Long, Long)].collect()
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (i, c) => (-c, i) }.take(5)
    assert(got.map(r => (r._1, r._2)).toSeq == exact)
    assert(got.forall(_._3 == 0L)) // no evictions -> zero error
    // eviction regime: a true heavy hitter (freq > N/capacity) survives
    val skewed = (Seq.fill(500)("hot") ++ (1 to 300).map(i => s"cold$i")).toDF("u")
      .repartition(4)
    val top = skewed.agg(TopKItems.topk_items($"u", 3, 16).as("t"))
      .select(explode($"t").as("x")).select($"x.item", $"x.cnt")
      .as[(String, Long)].collect()
    assert(top.head._1 == "hot")
    assert(top.head._2 >= 500L) // space-saving never undercounts
    // partial aggregation must run map-side (ObjectHashAggregate, not a
    // sort-based fallback): the shuffle carries sketches, not items
    val plan = skewed.agg(TopKItems.topk_items($"u", 3, 16))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
  }

  test("contaminationCheck flags the planted leak; corpusDiff classifies add/remove/change") {
    val corpus = Seq(
      (1L, base),                     // leaked: shares a long run with probe
      (2L, distinct1),
      (3L, distinct2)
    ).toDF("doc_id", "text")
    val probes = Seq((100L, base.replace("tonight", "today"))).toDF("doc_id", "text")
    val hits = TextOps.contaminationCheck(
        corpus, "doc_id", "text", probes, "doc_id", "text", 3, minShared = 5)
      .as[(Long, Long, Long)].collect()
    assert(hits.map(h => (h._1, h._2)).toSeq == Seq((1L, 100L)))

    val cur = Seq((1L, "same text"), (2L, "Same   Text"), (3L, "new doc"), (4L, "edited now"))
      .toDF("doc_id", "text")
    val known = Seq((1L, "same text"), (2L, "same text"), (4L, "edited before"), (9L, "gone"))
      .toDF("doc_id", "text")
    val diff = TextOps.corpusDiff(cur, known, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    // doc 1 identical, doc 2 identical after normalization -> absent
    assert(diff == Map(3L -> "added", 4L -> "changed", 9L -> "removed"))
  }

  test("spanDedup removes cross-doc duplicated blocks and reassembles in order") {
    // 4-token blocks; "shared boiler plate text" planted in docs 1 and 2
    val d = Seq(
      (1L, "shared boiler plate text unique one alpha beta"),
      (2L, "shared boiler plate text unique two gamma delta"),
      (3L, "totally separate words here nothing in common at")
    ).toDF("doc_id", "text")
    val out = TextOps.spanDedup(d, "doc_id", "text", blockTokens = 4, minDocs = 2)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._2 == "unique one alpha beta" && out(0)._3 == 1L)
    assert(out(1)._2 == "unique two gamma delta")
    assert(out(2)._2 == "totally separate words here nothing in common at" && out(2)._3 == 2L)
    // a doc that is ALL boilerplate vanishes
    val gone = TextOps.spanDedup(
      Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text"),
      "doc_id", "text", 4, 2)
    assert(gone.count() == 0)
  }

  test("substringDedup finds maximal shared spans at arbitrary offsets") {
    // k=3 shingles. Planted shares:
    //  - "a b c d e" in docs 1 (pos 0), 2 (pos 2 — offset!), 10 (pos 0)
    //  - "p q r" in docs 1 (pos 8) and 3 (pos 0)
    //  - doc 6 shares "g h i" (pos 0) and "i j k" (pos 2) with doc 7,
    //    whose middle window "h i j" is NOT shared: coverage overlaps
    //    (gap 2 <= k) so doc 6 must merge them into ONE span [0,5)
    //  - doc 7 holds the same two shingles at pos 0 and 4 (gap 4 > k):
    //    coverage does not touch -> TWO spans
    val d = Seq(
      (1L, "a b c d e x1 y1 z1 p q r"),
      (2L, "w1 w2 a b c d e w3"),
      (3L, "p q r s1 s2 s3 s4 s5"),
      (6L, "g h i j k l"),
      (7L, "g h i zz i j k"),
      (8L, "q8a q8b q8c q8d"), // nothing shared
      (9L, "s1 s2"),           // shorter than k: no shingles, no error
      (10L, "a b c d e t10a t10b")
    ).toDF("doc_id", "text")
    val out = TextOps.substringDedup(d, "doc_id", "text", k = 3, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 0L, 5L, 5L), (1L, 8L, 11L, 3L),
      (2L, 2L, 7L, 5L),
      (3L, 0L, 3L, 3L),
      (6L, 0L, 5L, 5L),
      (7L, 0L, 3L, 3L), (7L, 4L, 7L, 3L),
      (10L, 0L, 5L, 5L)), out.toString)

    // minDocs > 2 (agg+semi-join fallback): only the triple-shared
    // "a b c d e" run survives; the pairwise shares all drop
    val strict = TextOps.substringDedup(d, "doc_id", "text", k = 3, minDocs = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(strict == Seq(
      (1L, 0L, 5L, 5L), (2L, 2L, 7L, 5L), (10L, 0L, 5L, 5L)), strict.toString)

    // the removal half: spans cut out, survivors reassembled in order,
    // span-less docs pass through untouched
    val scrub = TextOps.substringScrub(d, "doc_id", "text", k = 3, minDocs = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(scrub == Seq(
      (1L, "x1 y1 z1", 3L, 8L),
      (2L, "w1 w2 w3", 3L, 5L),
      (3L, "s1 s2 s3 s4 s5", 5L, 3L),
      (6L, "l", 1L, 5L),
      (7L, "zz", 1L, 6L),
      (8L, "q8a q8b q8c q8d", 4L, 0L),
      (9L, "s1 s2", 2L, 0L),
      (10L, "t10a t10b", 2L, 5L)), scrub.toString)
  }

  test("substringCrossSpans: batch spans already in the corpus, within-batch shares ignored") {
    val corpus = Seq(
      (1L, "a b c d e x1 y1 z1"),
      (2L, "p q r c2a c2b")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "n1a a b c d e n1b"),   // corpus run at offset 1 -> [1,6)
      (12L, "p q r w1 w1b w1c"),    // corpus run at 0 -> [0,3)
      (13L, "zz1 zz2 zz3 zz4"),     // shares "zz1 zz2 zz3" with doc 14
      (14L, "zz1 zz2 zz3 zz5")      // ...but within-batch only: no rows
    ).toDF("doc_id", "text")
    val got = TextOps.substringCrossSpans(
        batch, "doc_id", "text", corpus, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((11L, 1L, 6L, 5L), (12L, 0L, 3L, 3L)), got.toString)
  }

  test("stratifiedSample is deterministic, nested across rates, and per-stratum") {
    val d = (0L until 2000L).map(i => (i, if (i % 2 == 0) "keep_all" else "rare"))
      .toDF("doc_id", "stratum")
    val full = TextOps.stratifiedSample(d, "doc_id", "stratum",
      Seq("keep_all" -> 1.0), defaultRate = 0.1)
    val kept = full.as[(Long, String)].collect()
    assert(kept.count(_._2 == "keep_all") == 1000) // rate 1.0 keeps everything
    val rareN = kept.count(_._2 == "rare")
    assert(rareN > 50 && rareN < 200, s"~10% of 1000 expected, got $rareN")
    // nesting: every id kept at 5% is kept at 10%
    val smaller = TextOps.stratifiedSample(d, "doc_id", "stratum",
      Seq("keep_all" -> 1.0), defaultRate = 0.05)
      .filter($"stratum" === "rare").as[(Long, String)].collect().map(_._1).toSet
    val larger = kept.filter(_._2 == "rare").map(_._1).toSet
    assert(smaller.subsetOf(larger))
  }

  test("minhashCrossPairs flags new docs near-duplicating the corpus, not novel ones") {
    val known = Seq((0L, base), (1L, distinct1)).toDF("doc_id", "text")
    val fresh = Seq(
      (100L, nearDup),    // near-dup of known doc 0
      (101L, distinct2)   // novel
    ).toDF("doc_id", "text")
    val pairs = TextOps.minhashCrossPairs(fresh, "doc_id", "text",
        known, "doc_id", "text", bands = 4, rowsPerBand = 2, shingleSize = 3)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 0L)))
  }

  test("spanDedup round-trip: with nothing to drop, reassembly reproduces the text") {
    val rnd = new scala.util.Random(31)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    // random lengths incl. awkward ones around the block size
    val d = (0 until 40).map { i =>
      val n = 1 + rnd.nextInt(20)
      (i.toLong, (0 until n).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextOps.spanDedup(d, "doc_id", "text", blockTokens = 6, minDocs = 1000L)
      .as[(Long, String, Long)].collect().map(t => t._1 -> t._2).toMap
    val want = d.as[(Long, String)].collect().toMap
    assert(out == want, "block segmentation + ordered reassembly must be lossless")
  }

  test("plan shapes: sampling is exchange-free, sessions one exchange, topk is TakeOrdered") {
    val noShuffle = TextOps.stratifiedSample(docs, "doc_id", "text",
        Seq.empty, defaultRate = 0.5)
      .queryExecution.executedPlan.toString()
    assert(!noShuffle.contains("Exchange"), s"sampling must not shuffle:\n$noShuffle")

    val ev = Seq((1L, new java.sql.Timestamp(0L), 1.0)).toDF("user_id", "ts", "value")
    val sessPlan = graft.operators.SessionOps
      .sessionSummaries(ev, Seq("user_id"), "ts", "value", "30 minutes")
      .queryExecution.executedPlan.toString()
    assert("Exchange hashpartitioning".r.findAllIn(sessPlan).size == 1,
      s"session_window should be one shuffle:\n$sessPlan")

    val topkPlan = TextOps.boilerplateTopK(docs, "doc_id", "text", 4, 2, 5)
      .queryExecution.executedPlan.toString()
    assert(topkPlan.contains("TakeOrderedAndProject"),
      s"global top-k should plan as TakeOrdered:\n$topkPlan")
  }

  test("boilerplateTopK ranks the planted template block first") {
    val d = Seq(
      (1L, "copyright footer text here unique alpha beta gamma"),
      (2L, "copyright footer text here unique delta epsilon zeta"),
      (3L, "copyright footer text here something else entirely ok"),
      (4L, "totally unrelated words with no shared block at")
    ).toDF("doc_id", "text")
    val top = TextOps.boilerplateTopK(d, "doc_id", "text", blockTokens = 4, minDocs = 2, k = 5)
      .as[(String, Long, Long)].collect()
    assert(top.head == (("copyright footer text here", 3L, 3L)))
    assert(top.forall(_._2 >= 2))
  }

  test("stratifiedTake yields exactly n per stratum and nests across n") {
    val d = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "stratum")
    val take5 = TextOps.stratifiedTake(d, "doc_id", "stratum", 5)
      .as[(Long, String)].collect()
    assert(take5.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("s0" -> 5, "s1" -> 5, "s2" -> 5))
    val take3 = TextOps.stratifiedTake(d, "doc_id", "stratum", 3)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(take3.subsetOf(take5.map(_._1).toSet)) // nested
    // deterministic across repartitionings
    val reparted = TextOps.stratifiedTake(d.repartition(7), "doc_id", "stratum", 5)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(reparted == take5.map(_._1).toSet)
  }

  test("weightedSample: weight-proportional, nested in rate, shuffle-free") {
    // weights 0, scale/2, >= scale -> p = 0, rate/2, rate (capped)
    val d = (0L until 3000L).map(i => (i, i % 3 match {
      case 0 => 0L; case 1 => 500L; case _ => 2000L
    })).toDF("doc_id", "w")
    val kept = TextOps.weightedSample(d, "doc_id", col("w"),
      weightScale = 1000L, rate = 1.0).as[(Long, Long)].collect()
    assert(kept.count(_._2 == 0L) == 0) // zero weight: never sampled
    assert(kept.count(_._2 == 2000L) == 1000) // p capped at 1: all kept
    val half = kept.count(_._2 == 500L)
    assert(half > 380 && half < 620, s"~50% of 1000 expected, got $half")
    // nesting: every id kept at rate 0.4 is kept at rate 1.0
    val smaller = TextOps.weightedSample(d, "doc_id", col("w"),
      weightScale = 1000L, rate = 0.4).as[(Long, Long)].collect().map(_._1).toSet
    assert(smaller.subsetOf(kept.map(_._1).toSet))
    // deterministic across partitionings, and a pure filter (no shuffle)
    val reparted = TextOps.weightedSample(d.repartition(7), "doc_id", col("w"),
      weightScale = 1000L, rate = 1.0).as[(Long, Long)].collect().map(_._1).toSet
    assert(reparted == kept.map(_._1).toSet)
    val plan = TextOps.weightedSample(d, "doc_id", col("w"), 1000L, 0.5)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"weighted sampling must not shuffle:\n$plan")
  }

  test("tfidfTopTerms ranks the doc-specific repeated term above corpus-wide terms") {
    val d = Seq(
      (1L, "spark spark spark common common"),
      (2L, "duck duck common common filler"),
      (3L, "common filler filler other words")
    ).toDF("doc_id", "text")
    val top = TextOps.tfidfTopTerms(d, "doc_id", "text", k = 2, minTf = 2L)
      .filter($"rank" === 1).as[(Long, String, Long, Long, Double, Int)]
      .collect().sortBy(_._1)
    // "spark" appears only in doc 1 (df=1, tf=3): score 3*3/1=9 beats "common" 2*3/3=2
    assert(top.map(t => (t._1, t._2)).toSeq == Seq((1L, "spark"), (2L, "duck"), (3L, "filler")))
    assert(top(0)._5 == 9.0)
  }

  test("hashingTfSparse is L2-normalized; sparseCosineTopK puts the exact dup at sim~1") {
    val tf = TextOps.hashingTfSparse(docs, "doc_id", "text", dim = 32)
    val norms = tf.groupBy($"doc_id")
      .agg(sum($"w" * $"w").as("n2")).as[(Long, Double)].collect()
    norms.foreach { case (id, n2) => assert(math.abs(n2 - 1.0) < 1e-9, s"doc $id norm $n2") }

    val knn = TextOps.sparseCosineTopK(tf, $"doc_id" === 0, k = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // doc 4 is an exact copy of doc 0 → cosine 1 at rank 1
    assert(knn.head._2 == 4L && math.abs(knn.head._3 - 1.0) < 1e-9)
  }

  test("sparseCosineTopK stop-bucket cap drops the universal token, keeps the near-dup") {
    // "the" appears in every doc (stop bucket); distinctive words are rare
    val d = Seq(
      (0L, "the alpha beta gamma delta"),
      (1L, "the alpha beta gamma delta"), // exact dup of 0
      (2L, "the zeta eta theta iota"),
      (3L, "the kappa lambda mu nu")
    ).toDF("doc_id", "text")
    val tf = TextOps.hashingTfSparse(d, "doc_id", "text", dim = 1024)
    val capped = TextOps.sparseCosineTopK(tf, $"doc_id" === 0, k = 3, maxBucketDocs = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // the stop bucket (4 docs > cap 3) is gone; dup still wins on the
    // 4 distinctive shared buckets, and docs 2/3 score zero overlap
    assert(capped.head._2 == 1L)
    assert(capped.length == 1, s"docs sharing only the stop word must vanish: ${capped.toSeq}")
    // exact (cap off) still ranks the dup first at sim 1
    val exact = TextOps.sparseCosineTopK(tf, $"doc_id" === 0, k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(exact.head._2 == 1L && math.abs(exact.head._3 - 1.0) < 1e-9)
    assert(exact.length == 3) // stop word links every doc when uncapped
  }

  test("sparseCosineTopK at the q_text_knn parameters prunes a 100-doc hot bucket") {
    // 100 docs all share the planted token "hot" (> the 64-doc cap);
    // doc 0's true near-dup is doc 1 via three distinctive tokens.
    val rows = (0L to 99L).map { i =>
      val distinct = i match {
        case 0L => "alpha beta gamma"
        case 1L => "alpha beta gamma"
        case n  => s"u${n}a u${n}b u${n}c"
      }
      (i, s"hot $distinct")
    }
    val d = rows.toDF("doc_id", "text")
    val tf = TextOps.hashingTfSparse(d, "doc_id", "text", dim = 4096)
    val capped = TextOps.sparseCosineTopK(tf, $"doc_id" === 0, k = 5, maxBucketDocs = 64L)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // the hot bucket (100 docs > cap 64) is pruned from candidates, so
    // only the real near-dup survives; uncapped, all 99 others are
    // candidates through the stop token
    assert(capped.map(_._2).toSeq == Seq(1L), s"got ${capped.toSeq}")
    val exact = TextOps.sparseCosineTopK(tf, $"doc_id" === 0, k = 5)
      .as[(Long, Long, Double, Int)].collect()
    assert(exact.length == 5 && exact.minBy(_._4)._2 == 1L)
  }

  test("contamination and sparse-knn plans broadcast the probe side") {
    val plan1 = TextOps.contaminationCheck(
        docs, "doc_id", "text", docs.filter($"doc_id" === 0), "doc_id", "text", 3, 1L)
      .queryExecution.executedPlan.toString()
    assert(plan1.contains("BroadcastHashJoin"), s"probe join should broadcast:\n$plan1")
    val plan2 = TextOps.sparseCosineTopK(
        TextOps.hashingTfSparse(docs, "doc_id", "text", 64), $"doc_id" === 0, 3)
      .queryExecution.executedPlan.toString()
    assert(plan2.contains("BroadcastHashJoin"), s"query side should broadcast:\n$plan2")
  }

  test("compress_ratio separates repetitive from diverse text, codegen and interpreted") {
    import graft.functions.CompressRatio.compress_ratio
    val d = Seq(
      (1L, "spam ham " * 300),                                  // highly repetitive
      (2L, (0 until 300).map(i => s"w${i * 7919 % 9973}x${i}").mkString(" ")), // diverse
      (3L, "")
    ).toDF("doc_id", "text")
    val got = d.select($"doc_id", compress_ratio($"text").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) < 0.1, s"repetitive should compress hard: ${got(1L)}")
    assert(got(2L) > 3 * got(1L), s"diverse should compress much less: $got")
    assert(got(3L) == 1.0)
    // interpreted eval (no codegen path) agrees bit-for-bit
    val interp = graft.functions.CompressRatio
      .ratioKernel(("spam ham " * 300).getBytes("UTF-8"))
    assert(interp == got(1L))
    // roundtrip proof holds on adversarial shapes: empty, unicode,
    // incompressible noise, multi-block (> 16383-byte) input
    import graft.functions.CompressRatio.compress_roundtrip_ok
    val rnd = new scala.util.Random(7)
    val adversarial = Seq(
      (1L, ""), (2L, "héllo wörld é中文 😀"),
      (3L, Array.fill(5000)(rnd.nextPrintableChar()).mkString),
      (4L, "block " * 10000)
    ).toDF("doc_id", "text")
    val rt = adversarial.select(compress_roundtrip_ok($"text").as("ok"))
      .as[Boolean].collect()
    assert(rt.forall(identity), "deflate roundtrip must be lossless on all shapes")
  }

  test("textStats and langId compute sane features") {
    val st = TextOps.textStats(docs, "doc_id", "text")
      .filter($"doc_id" === 0).head()
    assert(st.getAs[Long]("n_words") == 18L)
    assert(st.getAs[Long]("n_stopwords") == 4L) // 'the' x3 + 'and'
    val li = TextOps.langId(docs, "doc_id", "text", "text")
      .filter($"doc_id" === 0).head()
    assert(li.getAs[String]("predicted_lang") == "en")
  }

  test("tokenBudget keeps the best-quality prefix per source, cut by cumulative tokens") {
    // Source A: three docs of descending quality (longer text = higher
    // score under the n_words term); the budget admits the top two.
    val long1 = (1 to 40).map(i => s"alpha$i").mkString(" ") + " the of and"
    val long2 = (1 to 30).map(i => s"beta$i").mkString(" ") + " the of and"
    val short = "tiny doc the"
    val d = Seq(
      (1L, long1, "A"), (2L, long2, "B" /*other stratum*/),
      (3L, long1 + " extra the tokens here", "A"), (4L, short, "A")
    ).toDF("doc_id", "text", "source")
    val kept = TextOps.tokenBudget(d, "doc_id", "text", "source", budgetTokens = 171)
      .select("doc_id", "source", "cum_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // A's ordering is 3 (best) then 1 then 4; 3+1 fit in 171, 4 does not.
    assert(kept.map(_._1) == Seq(1L, 2L, 3L))
    val cumA = kept.filter(_._2 == "A").map(_._3)
    assert(cumA.max <= 171)
    // determinism: running totals are exact integers, cut is reproducible
    val again = TextOps.tokenBudget(d, "doc_id", "text", "source", budgetTokens = 171)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == Seq(1L, 2L, 3L))
  }

  test("embeddingDrift: worst per-dimension mean shift, exact micro sums") {
    import graft.functions.VectorOps
    val emb = Seq(
      (0L, Array(1.0f, 2.0f), 0),  // cohort A (even ids)
      (2L, Array(3.0f, 4.0f), 0),  // cohort A
      (1L, Array(0.0f, 0.0f), 0),  // cohort B
      (4L, Array(5.0f, 5.0f), 1),  // label 1, A only -> filtered out
      (5L, Array(1.0f, 1.0f), 1),  // label 1, B
      (6L, Array(1.0f, 2.0f), 1)   // label 1, A
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.embeddingDrift(emb, "embedding", "label",
      col("vec_id") % 2 === 0)
      .select("label", "n_dims", "max_abs_delta_micro", "worst_dim")
      .as[(Int, Long, Double, Long)].collect().sortBy(_._1).toSeq
    // label 0: meanA = (2e6, 3e6), meanB = (0, 0) -> worst dim 1, 3e6
    assert(got(0) == ((0, 2L, 3000000.0, 1L)))
    // label 1: meanA = (3e6, 3.5e6), meanB = (1e6, 1e6) -> dim 1, 2.5e6
    assert(got(1) == ((1, 2L, 2500000.0, 1L)))
  }

  test("rakeKeywords: stopword-delimited runs, degree/freq sums, ratio-of-sums order") {
    import graft.functions.TextOps
    val docs = Seq(
      (1L, "big data systems of big data pipelines"),
      (2L, "the quick brown fox and big data")).toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(docs, "doc_id", "text", topK = 10)
      .select("phrase", "n_occurrences", "n_words", "sum_degree", "sum_freq")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // hand-checked: freq(big)=freq(data)=3, deg(big)=deg(data)=3+3+2=8;
    // 'quick brown fox' words all deg 3 freq 1 -> score 3.0 ranks first,
    // the tied 19/7 phrases break alphabetically, 'big data' (16/6) last
    assert(got == Seq(
      ("quick brown fox", 1L, 3L, 9L, 3L),
      ("big data pipelines", 1L, 3L, 19L, 7L),
      ("big data systems", 1L, 3L, 19L, 7L),
      ("big data", 1L, 2L, 16L, 6L)))
  }

  test("rakeKeywords: repeated phrase counts occurrences once per run") {
    import graft.functions.TextOps
    val docs = Seq((1L, "alpha beta and alpha beta")).toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(docs, "doc_id", "text", topK = 5)
      .select("phrase", "n_occurrences", "sum_degree", "sum_freq")
      .as[(String, Long, Long, Long)].collect().toSeq
    // each word: freq 2, degree 2+2=4; phrase sums 8/4, two occurrences
    assert(got == Seq(("alpha beta", 2L, 8L, 4L)))
  }

  test("textrankKeywords: the hub of a word star ranks first; stopwords never enter the graph") {
    import graft.functions.TextOps
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "alpha gamma"),
      (3L, "alpha delta"),
      (4L, "the alpha")). // stopword bigram -> contributes no edge
      toDF("doc_id", "text")
    val got = TextOps.textrankKeywords(docs, "doc_id", "text", topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(got.map(_._1) == Seq("alpha", "beta", "delta", "gamma"))
    // the three spokes are structurally identical: exact same rank
    val spokes = got.filter(_._1 != "alpha").map(_._2).distinct
    assert(spokes.size == 1)
    assert(got.head._2 > spokes.head)
  }

  test("readability: counts words, sentence runs, vowel-group syllables; flesch formula") {
    import graft.functions.TextOps
    val docs = Seq(
      (1L, "Hello world. This is it!"),
      (2L, "")).toDF("doc_id", "text")
    val got = TextOps.readability(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // 5 words, 2 sentence runs ('.' and '!'), syllables 2+1+1+1+1 = 6
    val flesch = 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (6.0 / 5.0)
    assert(got(1L) == ((5L, 2L, 6L, Some(flesch))))
    // empty doc: zero words -> NULL score, one default sentence
    assert(got(2L) == ((0L, 1L, 0L, None)))
  }
}
