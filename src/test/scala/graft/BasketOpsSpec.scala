package graft

import graft.operators.BasketOps

/** Market-basket co-occurrence: unordered-pair counting, per-basket
  * item dedup, deterministic top-N ordering, and the mega-basket skew
  * guard.
  */
class BasketOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val facts = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L),
    (20L, 1L), (20L, 2L),
    (30L, 2L), (30L, 3L),
    (40L, 9L), (40L, 9L), (40L, 1L) // duplicate line: item counted once
  ).toDF("basket", "item")

  test("counts unordered pairs once, dedups basket lines, orders deterministically") {
    val got = BasketOps.coOccurrence(facts, "basket", "item", topN = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L), (2L, 3L, 2L), (1L, 3L, 1L)))
  }

  test("maxBasketItems drops over-cap baskets before the self-join") {
    val got = BasketOps.coOccurrence(facts, "basket", "item", topN = 10,
      maxBasketItems = 2L)
      .as[(Long, Long, Long)].collect().toSeq
    // basket 10 (3 distinct items) is dropped; 40 keeps {1, 9}
    assert(got == Seq((1L, 2L, 1L), (1L, 9L, 1L), (2L, 3L, 1L)))
  }
}
