package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Observability for the engine's skew-cap guards.
  *
  * Every banded/clustered near-dup operator carries a hot-bucket cap
  * (`bucketCap` / `clusterCap`): buckets past the cap are DROPPED
  * before the quadratic self-join, which keeps a degenerate bucket
  * from dominating the job at 100 TB — but it also means a capped
  * run's pair output is indistinguishable from a clean run's. On a
  * pathological corpus (round-11 sf10: every vector replicated 100×,
  * every cluster over cap) the result is an EMPTY pair set that reads
  * as "no duplicates", the opposite of the truth.
  *
  * This module makes the cap observable as data: [[of]] is the
  * one-row companion report every capping operator exposes through a
  * `*CapReport` entrypoint (same inputs, same band/cluster stage,
  * same cap), so a pipeline can gate on `n_capped_buckets == 0`
  * before trusting a pair set — or route the affected entities
  * through a finer-bucketed pass (more LSH planes, exact dedup)
  * when it isn't.
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
