package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence over an order/item fact table — the
  * "frequently bought together" read (reference domain analog: which
  * symbols trade in the same account-session). One hash aggregate
  * gathers each basket's (deduped, sorted) item set; two chained
  * Generates (posexplode, then explode over the tail slice) emit the
  * C(items,2) ordered pairs; one more hash aggregate counts per pair.
  *
  * The pair expansion is deliberately lambda-free: the earlier nested
  * `transform(... transform(slice(...)))` form evaluated its
  * higher-order lambdas on the interpreted path inside every row
  * (HOFs don't participate in whole-stage codegen) and profiled as
  * the dominant stage; explode/slice/posexplode are plain codegen'd
  * operators. Measured on the sf0.1 entry at local[32]: ~1.9 s warm
  * for the lambda form vs ~1.3 s for this one (the distinct +
  * self-join shape both replaced measured 3.8 s).
  *
  * Scale posture: two shuffles total (basket gather, pair count) —
  * a distinct + self-join shape pays three and a join besides. Per-basket
  * fan-out is C(items,2), bounded by the per-basket line cap (TPC-H:
  * ≤ 7 → ≤ 21 pairs) — linear in the table with a constant factor. A
  * pathological mega-basket would amplify quadratically, so
  * `maxBasketItems` drops over-cap baskets BEFORE the pair expansion
  * (the same report-don't-explode guard as the LSH bucket caps); the
  * gathered set itself is bounded by basket width, never corpus size.
  * The final top-N plans as TakeOrderedAndProject (per-partition
  * top-k, no global sort).
  */
object BasketOps {

  /** Top-`topN` co-occurring item pairs: (item_a, item_b, n_baskets),
    * ordered by count desc with a full (item_a, item_b) tiebreak so
    * the limit is deterministic. `maxBasketItems = 0` disables the
    * skew guard (fine when the schema bounds basket width).
    */
  def coOccurrence(
      facts: DataFrame,
      basketCol: String,
      itemCol: String,
      topN: Int,
      maxBasketItems: Long = 0L
  ): DataFrame = {
    // Par.spread on the basket key replaces the basket aggregate's own
    // exchange (same exchange count) with one AQE cannot coalesce: the
    // fused stage downstream of it — complete basket aggregate + the
    // C(items,2) posexplode/explode pair expansion + partial pair
    // count — is the query's compute bill, and AQE had been sizing it
    // by its INPUT bytes (a few MB of basket sets → 1 task carrying
    // ~1 s of task time at sf0.1 on 32 cores, round-15 profile).
    // Trade-off, measured and accepted: the exchange now carries the
    // projected raw (basket, item) rows instead of map-side partial
    // sets (~2-3x the bytes here — lineitem clusters a basket's rows
    // inside one scan split, so partial collect_set was an effective
    // combiner). The pair stage's per-byte work is ~10-20x a plain
    // aggregate's, so stage width dominates the byte delta at every
    // width; the projection keeps the exchange at two columns.
    val baskets = graft.api.Par
      .spread(facts.select(col(basketCol), col(itemCol)), Seq(col(basketCol)))
      .groupBy(col(basketCol).as("__b"))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
    val guarded =
      if (maxBasketItems <= 0L) baskets
      else baskets.filter(size(col("__items")) <= maxBasketItems)
    val pairs = guarded
      .select(col("__items"), posexplode(col("__items")).as(Seq("__i", "item_a")))
      // slice is 1-based and tolerates over-long lengths, so
      // (i+2, size) is exactly the strict tail after position __i
      .select(col("item_a"),
        explode(slice(col("__items"), col("__i") + lit(2), size(col("__items")))).as("item_b"))
    // Second spread: the pair-count aggregate's merge stage is equally
    // compute-dense (a hash merge over every distinct pair) and was
    // the single remaining 1-task stage after the first spread
    // (~0.7 s at sf0.1, round-15 profile). Pinning its exchange keys
    // it by the pair itself, so the count below completes in-place.
    graft.api.Par.spread(pairs, Seq(col("item_a"), col("item_b")))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .orderBy(col("n_baskets").desc, col("item_a").asc, col("item_b").asc)
      .limit(topN)
  }
}
