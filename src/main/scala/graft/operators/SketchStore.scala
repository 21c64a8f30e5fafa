package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted partial-aggregate states, merged at read — the Spark
  * rendering of ClickHouse's AggregateFunction columns inside an
  * AggregatingMergeTree (the natural extension of the reference's
  * uniq/uniqExact split, app/data_quality_check.py:460): instead of
  * re-scanning history to count distincts over a growing window, store
  * one mergeable HLL sketch per (keys, day) and answer any
  * range/rollup query by unioning sketches.
  *
  * Spark-first: the sketch IS `functions.hll_sketch_agg` (Apache
  * DataSketches), its state a plain binary column any parquet store
  * can hold, its merge `hll_union_agg` — no custom aggregate needed.
  * The binary states round-trip through parquet bit-for-bit
  * (md5-asserted in SketchStoreSpec). The merged ESTIMATE is exact
  * only about the registers, not the merge tree: DataSketches drops
  * its order-dependent HIP estimator on union, so a different
  * partitioning of the parts can move the estimate within the
  * sketch's error bound — the same contract ClickHouse's uniqState
  * merge trees give. For a fixed store layout the result is
  * reproducible; any layout stays within the accuracy bound.
  *
  * 100 TB posture: the store shrinks each day's events to one ~KB row
  * per key; answering "distinct users last quarter per type" scans
  * days x keys sketch rows instead of the event stream. Both the build
  * and the merge are map-side-combinable single-shuffle aggregates.
  */
object SketchStore {

  /** One HLL sketch (and an exact companion count of rows folded in)
    * per (keys..., day) — the daily "part" an AggregatingMergeTree
    * would hold. `lgK` trades size for accuracy (12 -> ~1.6 KB, ~2%).
    */
  def dailySketches(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      distinctCol: String,
      lgK: Int = 12
  ): DataFrame =
    events
      .groupBy(keys.map(col) :+ to_date(col(tsCol)).as("day"): _*)
      .agg(
        hll_sketch_agg(col(distinctCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Streaming build of the daily parts: the same sketch aggregation
    * over a watermarked stream, one updating row per (keys, day) —
    * ClickHouse's AggregatingMergeTree ingest path. Write with
    * update/complete mode (or foreachBatch upsert into the parquet
    * store); finalized days stop updating once the watermark passes.
    */
  def streamingDailySketches(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      distinctCol: String,
      watermark: String,
      lgK: Int = 12
  ): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        keys.map(col) :+ window(col(tsCol), "1 day")("start").cast("date").as("day"): _*)
      .agg(
        hll_sketch_agg(col(distinctCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Merge stored sketches back to one estimate per key group —
    * arbitrary re-aggregation (drop the day, keep any key subset)
    * without touching raw events.
    */
  def mergedDistinct(
      store: DataFrame,
      groupKeys: Seq[String]
  ): DataFrame =
    store
      .groupBy(groupKeys.map(col): _*)
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true)))
          .as("approx_distinct"),
        count(lit(1)).as("n_parts"),
        sum(col("n_rows")).as("n_rows"))

  /** The EXACT companion of the sketch store — ClickHouse's
    * uniqExactState analog: each daily part holds the day's distinct
    * values themselves (one row per (keys, day, value), with the
    * folded row count), and the read-side merge is a count of
    * distinct values over the part rows. Same store layout, same
    * merge-of-daily-states contract, no estimator — so the merged
    * result hash-matches a one-shot GROUP BY over the union of the
    * raw events, which is exactly the store-contract check the
    * approximate path can't offer.
    *
    * Scale: the part table carries one row per distinct (key, day,
    * value) — bounded by daily actives, not events; both levels are
    * map-side-combinable hash aggregates. This is the exact/approx
    * split of the reference's uniqExact vs uniq
    * (app/data_quality_check.py:460): pay part-table size for
    * exactness, or ~KB sketches for bounded error.
    */
  def dailyExactParts(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      distinctCol: String
  ): DataFrame =
    events
      .groupBy(keys.map(col) :+ to_date(col(tsCol)).as("day") :+
        col(distinctCol).as("value"): _*)
      .agg(count(lit(1)).as("n_rows"))

  /** Merge exact daily parts back to one exact distinct per key group
    * — any re-aggregation (drop the day, keep any key subset) without
    * touching raw events, and without estimator error.
    */
  def mergedDistinctExact(
      store: DataFrame,
      groupKeys: Seq[String]
  ): DataFrame =
    store
      .groupBy(groupKeys.map(col): _*)
      .agg(
        countDistinct(col("value")).as("n_distinct"),
        countDistinct(col("day")).as("n_parts"),
        sum(col("n_rows")).as("n_rows"))
}
