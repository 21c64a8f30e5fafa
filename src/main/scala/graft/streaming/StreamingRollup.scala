package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.operators.CandleOps

/** Structured-Streaming restatement of the reference's realtime path
  * (SURVEY.md §2.8, §3.1): closed candles arrive on a stream, per-grain
  * OHLCV windows aggregate incrementally, finalized windows append to
  * the rollup store.
  *
  * Semantics mapping (reference → Spark):
  *   - `candle_closed_only=True` (app/data_collector.py:151): the source
  *     emits only finalized 1m candles — the stream is already
  *     event-time-complete per minute.
  *   - incremental MV cascade (app/clickhouse_schema.py:167-206): here a
  *     watermarked tumbling-window aggregation per grain; append mode
  *     emits a bucket exactly once, when the watermark passes its end.
  *   - no-watermark late data in ClickHouse (merged in place whenever it
  *     arrives): the reference's real late-data mechanism is the
  *     reconciliation watchdog (data_quality_check.py:672-681), which we
  *     keep as the batch gap/repair jobs (GapOps + recompute). The
  *     streaming watermark handles the hot path; reconciliation handles
  *     post-watermark stragglers. At-least-once sinks stay correct
  *     because the store is deduped on read (CandleOps.latestByKey) and
  *     rollup recompute is idempotent.
  */
object StreamingRollup {

  /** Watermarked tumbling OHLCV aggregation over a streaming frame.
    * Identical aggregate expressions to the batch path (CandleOps
    * .ohlcvRollup) — the equivalence the tests assert. State size is
    * bounded by (#keys × windows inside watermark), not by history.
    *
    * With `withCarriers=true` the stream emits the SAME re-aggregable
    * carrier shape as `CandleOps.ohlcvRollup(withCarriers = true)`
    * (`open_ts`/`close_ts` argmin/argmax carriers + exact long
    * `vol_cents` instead of a double `volume`) — so a store landed by
    * [[toParquetSink]] can, after [[graft.operators.RollupStore
    * .compactPartitions]], be registered with the RollupRouter and
    * serve routed aggregates exactly like a batch-built carrier store.
    */
  def streamingOhlcv(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      grain: String,
      watermark: String,
      withCarriers: Boolean = false
  ): DataFrame = {
    val ts = col(tsCol)
    val v = col(valueCol)
    val base = Seq(
      min_by(v, ts).as("open"),
      max(v).as("high"),
      min(v).as("low"),
      max_by(v, ts).as("close"),
      count(lit(1)).as("trades"))
    val extra =
      if (withCarriers)
        Seq(
          min(ts).as("open_ts"),
          max(ts).as("close_ts"),
          sum(graft.functions.Cents.cents(v)).as("vol_cents"))
      else Seq(CandleOps.moneySum(v).as("volume"))
    val aggs = base ++ extra
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(keys.map(col) :+ window(ts, grain).as("__w"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket_ts", col("__w.start"))
      .drop("__w")
  }

  /** Exactly-once sink into a parquet rollup directory, partitioned by
    * month of bucket (the reference's `PARTITION BY toYYYYMM`,
    * app/clickhouse_schema.py:162) and by batch sequence number.
    *
    * Exactly-once without a manifest: each micro-batch lands in its own
    * `batch_seq=<streamKey>-<batchId>` partition via DYNAMIC partition
    * overwrite — a replayed batch (crash before the streaming
    * checkpoint committed, whether before, during, or after the data
    * write) re-OVERWRITES exactly its own partitions and touches no
    * other batch's files, so re-delivery cannot double-append (the
    * [[EdgeStream]] manifest contract, expressed in the layout itself).
    * The stream key is a digest of the checkpoint path: batchIds are
    * only comparable within one checkpoint's lifetime, so a REPLACED
    * checkpoint (fresh query, ids restarting at 0) gets fresh
    * partitions instead of clobbering the old sequence's batch 0.
    *
    * `bucket_month` stays the outer partition, so month-range pruning
    * is unaffected; readers see a `batch_seq` bookkeeping column they
    * can ignore, and [[graft.operators.RollupStore.compactPartitions]]
    * folds the per-batch dirs away on the maintenance cadence (the
    * same OPTIMIZE FINAL analog the store already runs).
    */
  def toParquetSink(
      rollup: DataFrame,
      path: String,
      checkpoint: String
  ): DataStreamWriter[Row] = {
    val key = graft.streaming.EdgeStream.streamKey(checkpoint)
    rollup
      .withColumn("bucket_month", date_format(col("bucket_ts"), "yyyyMM"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, path, key, batchId)
      }
  }

  /** One micro-batch's landing ([[toParquetSink]]'s foreachBatch body,
    * separated so the crash-window replay semantics are directly
    * spec-testable): dynamic partition overwrite into this batch's own
    * `(bucket_month, batch_seq)` partitions — idempotent under replay,
    * invisible to every other batch's partitions.
    */
  private[graft] def writeBatch(
      batch: DataFrame,
      path: String,
      key: String,
      batchId: Long
  ): Unit =
    batch
      .withColumn("batch_seq", lit(f"$key%s-$batchId%09d"))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket_month", "batch_seq")
      .parquet(path)

  /** Convenience: run the sink to completion over currently-available
    * input (test/backfill harness path).
    */
  def runAvailableNow(writer: DataStreamWriter[Row]): StreamingQuery = {
    val q = writer.start()
    q.awaitTermination()
    q
  }

  /** Streaming exact dedup at ingest — the streaming half of the
    * ReplacingMergeTree contract (the reference relies on the table
    * engine to collapse re-delivered candles; we drop them before the
    * sink): duplicate key rows arriving within the watermark horizon
    * are suppressed, so an at-least-once upstream (reconnect replays,
    * producer retries) yields exactly-once rows downstream.
    * `dropDuplicatesWithinWatermark` keeps dedup state bounded by the
    * watermark (plain `dropDuplicates` on a stream retains every key
    * seen FOREVER — unusable at 100 TB/day); duplicates farther apart
    * than the watermark fall through to the store's dedup-on-read,
    * same as late data falls through to reconciliation.
    */
  def streamingDedup(
      stream: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermark: String
  ): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** R1 — the full cascade as streaming: fan one candle stream out to
    * every grain, each as its own independent query + sink +
    * checkpoint (so one slow grain never backpressures another; the
    * reference's MV cascade is similarly per-view). Returns
    * grain-label → writer; caller starts/awaits them.
    *
    * Each grain aggregates the RAW stream rather than the previous
    * grain's sink (unlike ClickHouse's chained MVs): chaining streaming
    * aggregations would stack watermark delays per level, and the A6
    * commutativity (cascade ≡ direct, unit-tested) makes direct
    * aggregation semantically identical.
    */
  def streamAllGrains(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      watermark: String,
      basePath: String,
      grains: Seq[graft.model.Timeframe] = graft.model.Timeframe.RollupGrains
  ): Map[String, DataStreamWriter[Row]] =
    grains.map { g =>
      val agg = streamingOhlcv(stream, keys, tsCol, valueCol, g.sparkInterval, watermark)
      g.label -> toParquetSink(agg,
        s"$basePath/rollup_${g.label}", s"$basePath/ckpt_${g.label}")
    }.toMap
}
