package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Line-grain scrubs: the in-document first-occurrence pass
  * ([[TextOps.lineScrub]]) and the cross-corpus frequent-line strip
  * ([[TextOps.boilerplateScrub]]) — hand-computed rebuilds, the
  * all-boilerplate empty-doc survival, order preservation, and the
  * in-doc pass's zero-shuffle plan pin.
  */
class LineScrubSpec extends SparkSpec {
  import spark.implicits._

  test("lineScrub keeps each line's first occurrence in order") {
    val docs = Seq(
      (1L, "a\nb\na\nc\nb\na"),
      (2L, "x\ny"),
      (3L, "solo")).toDF("doc_id", "text")
    val got = TextOps.lineScrub(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "a\nb\nc", 6L, 3L)))
    assert(got(1) == ((2L, "x\ny", 2L, 0L)))
    assert(got(2) == ((3L, "solo", 1L, 0L)))
  }

  test("lineScrub treats repeated empty lines as repeats too") {
    val docs = Seq((1L, "a\n\nb\n\nc")).toDF("doc_id", "text")
    val got = TextOps.lineScrub(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].head()
    assert(got == ((1L, "a\n\nb\nc", 5L, 1L)))
  }

  test("lineScrub is a pure projection: zero exchanges") {
    val docs = Seq((1L, "a\nb")).toDF("doc_id", "text")
    val plan = TextOps.lineScrub(docs, "doc_id", "text")
      .queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty)
  }

  test("boilerplateScrub removes every copy of corpus-frequent lines only") {
    // "promo" in 3 distinct docs (>= minDocs 3, removed everywhere,
    // including doc 1's double copy); "rare" in 2 docs (survives);
    // bodies unique per doc (survive)
    val docs = Seq(
      (1L, "promo\nbody-one\npromo"),
      (2L, "promo\nbody-two\nrare"),
      (3L, "rare\nbody-three\npromo"),
      (4L, "body-four")).toDF("doc_id", "text")
    val got = TextOps.boilerplateScrub(docs, "doc_id", "text", minDocs = 3L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "body-one", 3L, 2L)))
    assert(got(1) == ((2L, "body-two\nrare", 3L, 1L)))
    assert(got(2) == ((3L, "rare\nbody-three", 3L, 1L)))
    assert(got(3) == ((4L, "body-four", 1L, 0L)))
  }

  test("boilerplateScrub: a doc that was ALL boilerplate survives with empty text") {
    val docs = Seq(
      (1L, "promo"),
      (2L, "promo\nkeep-me"),
      (3L, "promo")).toDF("doc_id", "text")
    val got = TextOps.boilerplateScrub(docs, "doc_id", "text", minDocs = 2L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "", 1L, 1L)))
    assert(got(1) == ((2L, "keep-me", 2L, 1L)))
    assert(got(2) == ((3L, "", 1L, 1L)))
  }

  test("boilerplateScrub preserves original line order across many lines") {
    val body = (0 until 50).map(i => s"line-$i").mkString("\n")
    val docs = Seq(
      (1L, s"promo\n$body\npromo"),
      (2L, "promo"),
      (3L, "promo")).toDF("doc_id", "text")
    val got = TextOps.boilerplateScrub(docs, "doc_id", "text", minDocs = 3L)
      .filter(col("doc_id") === 1L)
      .as[(Long, String, Long, Long)].head()
    assert(got._2 == body)
    assert(got._3 == 52L && got._4 == 2L)
  }
}
