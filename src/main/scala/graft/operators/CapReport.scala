package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Observability for the engine's skew-cap guards.
  *
  * The banded/clustered near-dup operators carry a hot-bucket cap
  * (`bucketCap` / `clusterCap`). Two regimes exist:
  *
  *  - DROPPING caps (the text band joins): buckets past the cap are
  *    discarded before the quadratic self-join — which keeps a
  *    degenerate bucket from dominating the job at 100 TB, but also
  *    means a capped run's pair output is indistinguishable from a
  *    clean run's. On a pathological corpus (round-11 sf10: every
  *    vector replicated 100×, every cluster over cap) the result was
  *    an EMPTY pair set that read as "no duplicates", the opposite of
  *    the truth. [[of]] is their companion report: gate on
  *    `n_capped_buckets == 0` before trusting the pairs.
  *
  *  - BLOCKED caps (the vector cosine family, round 13): over-cap
  *    clusters are sub-sharded into block pairs instead of dropped —
  *    the pair set is exact, the cap only bounds per-task row counts.
  *    [[ofBlocked]] is their companion: a cost gauge (comparison
  *    count, task fan-out), not a recall alarm.
  *
  * Both reports run the same band/cluster stage as their operator at
  * the same cap, so a pipeline can read them before (or alongside)
  * the pair queries.
  *
  * Cost shape: the report is ONE count window over the same key the
  * operator's own guard windows on, plus a 1-row global aggregate —
  * no join, no extra exchange class beyond the guard's own, safe at
  * any scale the operator itself serves.
  */
object CapReport {

  /** One-row summary of what a bucket cap does to a banded stage.
    *
    * @param banded the UNCAPPED banded/clustered rows, one row per
    *               (entity, bucket) membership
    * @param keys   the bucket key columns (the guard's window key)
    * @param idCol  the entity id column (doc/media/vector/key id)
    * @param cap    the cap the operator runs with
    * @return 1 row: `n_buckets` (distinct buckets), `n_capped_buckets`
    *         (buckets past the cap — 0 means the paired operator ran
    *         clean), `n_rows_dropped` (memberships discarded),
    *         `n_entities_affected` (distinct entities with at least
    *         one dropped membership — these entities' recall is
    *         reduced, not necessarily zero: they may still pair via
    *         uncapped buckets), `max_bucket_n` (worst bucket).
    */
  /** One-row cost gauge for a BLOCKED (sub-sharded) pair stage —
    * the round-13 companion to operators that no longer drop over-cap
    * buckets but split them into ceil(n/cap) block shards and join
    * all block pairs ([[graft.functions.VectorOps.cosineNearDupPairs]]).
    * Nothing is shed, so there is no recall column; the report tells
    * you what the exact all-pairs contract COSTS on this input before
    * you run it at scale.
    *
    * @param banded the UNCAPPED banded/clustered rows, one row per
    *               (entity, bucket) membership
    * @param keys   the bucket key columns
    * @param cap    the block size the operator runs with (rows per
    *               join-task side); cap <= 0 = single block
    * @return 1 row: `n_buckets`, `n_split_buckets` (buckets past the
    *         block size), `n_split_blocks` (total shards those split
    *         into — the task fan-out), `max_bucket_n` (worst bucket),
    *         `n_pair_comparisons` (sum of n·(n−1)/2 over all buckets —
    *         the exact number of similarity evaluations the blocked
    *         join performs).
    */
  def ofBlocked(banded: DataFrame, keys: Seq[String], cap: Long): DataFrame = {
    val sizes = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    // cap <= 0 is documented single-block mode: nothing splits, so the
    // split columns are identically 0 (without the guard the `__n > cap`
    // predicates would count every non-empty bucket as split).
    val isSplit: Column =
      if (cap <= 0L) lit(false) else col("__n") > cap
    val blocks =
      if (cap <= 0L) lit(1L)
      else expr(s"(__n + ${cap - 1L}) div ${cap}")
    sizes.agg(
      count(lit(1)).cast("long").as("n_buckets"),
      coalesce(sum(when(isSplit, lit(1L)).otherwise(lit(0L))), lit(0L))
        .cast("long").as("n_split_buckets"),
      coalesce(sum(when(isSplit, blocks)), lit(0L))
        .cast("long").as("n_split_blocks"),
      coalesce(max(col("__n")), lit(0L)).cast("long").as("max_bucket_n"),
      coalesce(sum(expr("__n * (__n - 1) div 2")), lit(0L))
        .cast("long").as("n_pair_comparisons"))
  }

  def of(banded: DataFrame, keys: Seq[String], idCol: String, cap: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    val bucket: Column = struct(keys.map(col): _*)
    banded
      .withColumn("__n", count(lit(1)).over(w))
      .agg(
        count_distinct(bucket).as("n_buckets"),
        count_distinct(when(col("__n") > cap, bucket)).as("n_capped_buckets"),
        count(when(col("__n") > cap, lit(1))).cast("long").as("n_rows_dropped"),
        count_distinct(when(col("__n") > cap, col(idCol))).as("n_entities_affected"),
        coalesce(max(col("__n")), lit(0L)).cast("long").as("max_bucket_n"))
  }
}
