package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence over an order/item fact table — the
  * "frequently bought together" read (reference domain analog: which
  * symbols trade in the same account-session). Self-join on the basket
  * key with `itemA < itemB` to emit each unordered pair once, then one
  * hash-count per pair.
  *
  * Scale posture: the join key is the BASKET id, so fan-out per basket
  * is C(items,2) — bounded by the per-basket line cap (TPC-H: ≤ 7 →
  * ≤ 21 pairs), i.e. linear in the table with a constant factor, never
  * rows². The two sides are the same partitioned scan; Catalyst reuses
  * one exchange for both join inputs. A pathological mega-basket would
  * amplify quadratically — `maxBasketItems` drops baskets over the cap
  * (the same report-don't-explode guard as the LSH bucket caps).
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
    val items = facts.select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
    val guarded =
      if (maxBasketItems <= 0L) items
      else {
        val sizes = items.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
        items.join(sizes.filter(col("__n") <= maxBasketItems).select(col("__b")), "__b")
      }
    val a = guarded.select(col("__b"), col("__i").as("item_a"))
    val b = guarded.select(col("__b"), col("__i").as("item_b"))
    a.join(b, Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .orderBy(col("n_baskets").desc, col("item_a").asc, col("item_b").asc)
      .limit(topN)
  }
}
