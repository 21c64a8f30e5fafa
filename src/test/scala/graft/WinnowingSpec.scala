package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextOps, Winnowing}

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val shared =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
  private val docA = s"intro words here $shared tail words"
  private val docB = s"completely different prefix tokens $shared other ending"
  private val docC = "unrelated content with nothing in common at all whatsoever totally distinct"

  test("winnowing guarantees a shared fingerprint for long shared runs") {
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val fps = docs.select($"doc_id",
        Winnowing.winnow(TextOps.tokens($"text"), k = 4, w = 4).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    // shared run is 16 tokens >= k + w - 1 = 7 → guaranteed overlap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
    assert(fps(1L).toSet.intersect(fps(3L).toSet).isEmpty)
    // density: ~2/(w+1) of grams, far fewer than all grams
    assert(fps(1L).size < docA.split(" ").length)
  }

  test("fingerprints are position-invariant for the shared content") {
    val a = Seq((1L, shared)).toDF("doc_id", "text")
    val b = Seq((2L, s"x y z $shared")).toDF("doc_id", "text")
    val fa = a.select(Winnowing.winnow(TextOps.tokens($"text"), 4, 4)).as[Seq[Long]].head().toSet
    val fb = b.select(Winnowing.winnow(TextOps.tokens($"text"), 4, 4)).as[Seq[Long]].head().toSet
    assert(fa.intersect(fb).nonEmpty) // rolling hashes don't depend on offset
  }

  test("short docs produce no fingerprints, never crash") {
    val docs = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val out = docs.select(Winnowing.winnow(TextOps.tokens($"text"), 4, 4).as("f"))
      .as[Seq[Long]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("property: any shared run >= k+w-1 tokens yields a shared fingerprint (500 random cases)") {
    // the MOSS guarantee, fuzzed at the kernel level (row-local, no
    // Spark needed): random vocab, random prefixes/suffixes, random
    // (k, w), shared run of exactly k + w - 1 tokens — the minimum the
    // guarantee covers
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def winnowSet(tokens: Seq[String], k: Int, w: Int): Set[Long] = {
      val arr = new GenericArrayData(
        tokens.map(t => UTF8String.fromString(t): Any).toArray)
      val out = Winnowing.winnowArray(arr, k, w)
      (0 until out.numElements()).map(out.getLong).toSet
    }
    val rng = new scala.util.Random(20240312L)
    for (trial <- 0 until 500) {
      val k = 2 + rng.nextInt(4)
      val w = 2 + rng.nextInt(4)
      val vocab = Vector.tabulate(30)(j => s"t$j")
      def randToks(n: Int) = Seq.fill(n)(vocab(rng.nextInt(vocab.size)))
      val shared = randToks(k + w - 1)
      val a = randToks(rng.nextInt(8)) ++ shared ++ randToks(rng.nextInt(8))
      val b = randToks(rng.nextInt(8)) ++ shared ++ randToks(rng.nextInt(8))
      val (fa, fb) = (winnowSet(a, k, w), winnowSet(b, k, w))
      assert(fa.intersect(fb).nonEmpty,
        s"trial $trial k=$k w=$w: no shared fingerprint\nA=$a\nB=$b")
      // density: far sparser than one fingerprint per gram
      val nGramsA = a.length - k + 1
      assert(fa.size <= nGramsA)
    }
  }

  test("winnowNearDupPairs surfaces overlapping docs only") {
    val docs = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docA)).toDF("doc_id", "text")
    val pairs = Winnowing.winnowNearDupPairs(docs, "doc_id", "text", 4, 4, minShared = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
