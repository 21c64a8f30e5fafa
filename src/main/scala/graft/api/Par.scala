package graft.api

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism pin for compute-dense stages.
  *
  * AQE coalesces post-shuffle partitions by shuffle BYTES
  * (`advisoryPartitionSizeInBytes`), which is the right currency for
  * byte-bound stages but serializes the engine's compute-amplifying
  * ones: a bucket-aligned pair join fans each input row out to
  * O(universe) outputs, and a lag-convolution window does O(n·lags)
  * decimal arithmetic per input byte — both were measured running in
  * 1-2 tasks on a 32-core local session because their INPUT shuffle is
  * a couple of MB (round-15 profile: corrMatrix 14 s of task time in 2
  * tasks; the MACD window 0.9 s in 1). Coalescing sees the bytes, not
  * the bill.
  *
  * [[spread]] pins the session's configured shuffle parallelism onto
  * such a stage with an explicit hash repartition on the stage's own
  * clustering key:
  *
  *   - explicit numPartitions = `spark.sql.shuffle.partitions`, the
  *     session's own scale knob (Bench sets it to the core count; a
  *     cluster session sets it to the cluster's tuned width) — never a
  *     constant;
  *   - AQE does not coalesce a user-specified partition count, so the
  *     downstream stage actually runs that wide;
  *   - EnsureRequirements recognizes the partitioning for any
  *     downstream window/aggregate/join clustered on the same keys, so
  *     where the consumer would have inserted its own exchange this
  *     REPLACES it (same exchange count, plan-diffed per call site).
  *
  * Trade-off, documented once here: a user-pinned exchange also opts
  * out of AQE skew-split for the stage. Every call site is an operator
  * whose per-key group size is bounded by construction (indicator
  * windows: one key's candle series; corrMatrix: a bucket holds at
  * most `maxUniverse` aligned keys), so byte-skew splitting has
  * nothing to split there, while the compute bill it would ignore is
  * the whole stage.
  */
object Par {

  /** Hash-repartition `df` on `cols` at the session's configured
    * shuffle parallelism (see object doc). Use immediately upstream of
    * a compute-dense window/aggregate/join clustered on `cols`.
    */
  def spread(df: DataFrame, cols: Seq[Column]): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, cols: _*)
}
