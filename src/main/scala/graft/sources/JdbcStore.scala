package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.CandleOps

/** External-warehouse boundary over plain JDBC — the seam where the
  * reference pushes rows into ClickHouse over its native protocol
  * (app/data_collector.py:250-283) and BASELINE's stated mapping is
  * "Structured Streaming + ClickHouse sink". The engine's contract at
  * this boundary is deliberately at-least-once + read-side dedup:
  *
  *   - writes APPEND with bounded retry (the reference retries its
  *     inserts the same way; a retried half-delivered batch may
  *     duplicate rows),
  *   - reads restore exactly-once semantics by last-writer-wins per
  *     key ([[CandleOps.latestByKey]], the B2 contract) — precisely
  *     the ReplacingMergeTree dedup-on-merge trick the reference's
  *     schema leans on (app/clickhouse_schema.py:131-143).
  *
  * Everything here is public Spark API (`DataFrameWriter.jdbc` /
  * `spark.read.jdbc`); any warehouse with a JDBC driver on the
  * classpath plugs in via `url` + `Properties`. Tests run against
  * embedded Derby.
  *
  * Scale note: `DataFrameWriter.jdbc` opens one connection per
  * partition and writes partitions in parallel — batch size and
  * parallelism are governed by the frame's partitioning, so a rollup
  * frame repartitioned to the sink's ingest width IS the tuning knob
  * (same knob the reference exposes as its insert chunk size).
  */
object JdbcStore {

  /** Bounded retry with exponential backoff — transient sink failures
    * (connection reset, deadlock victim) retry; the last failure
    * propagates. Retrying a partially-applied JDBC append is exactly
    * what makes the boundary at-least-once; downstream reads dedup.
    */
  def withRetry[A](maxRetries: Int, backoffMs: Long = 100L)(f: => A): A = {
    require(maxRetries >= 0, s"maxRetries=$maxRetries must be >= 0")
    var attempt = 0
    var out: Option[A] = None
    var lastErr: Throwable = null
    while (out.isEmpty && attempt <= maxRetries) {
      // NonFatal only: an OutOfMemoryError or a streaming-shutdown
      // InterruptedException must propagate immediately, not spin
      // through the backoff loop with the interrupt flag swallowed
      try out = Some(f)
      catch {
        case scala.util.control.NonFatal(e) =>
          lastErr = e
          if (attempt < maxRetries && backoffMs > 0)
            Thread.sleep(backoffMs << attempt)
      }
      attempt += 1
    }
    out.getOrElse(throw lastErr)
  }

  /** Append a batch into `table`, creating it on first write (Spark's
    * JDBC writer issues the DDL from the frame schema).
    */
  def writeAppend(
      df: DataFrame,
      url: String,
      table: String,
      props: Properties,
      maxRetries: Int = 3,
      backoffMs: Long = 100L
  ): Unit =
    withRetry(maxRetries, backoffMs) {
      df.write.mode("append").jdbc(url, table, props)
    }

  /** Streaming sink: each micro-batch appends over JDBC with retry;
    * exactly-once bookkeeping of INPUT offsets rides on the stream
    * checkpoint, while a mid-batch failure may leave the batch half
    * delivered before its retry — hence at-least-once rows, restored
    * to exactly-once by [[readLatest]]. Mirrors
    * [[graft.streaming.StreamingRollup.toParquetSink]] with the store
    * swapped.
    */
  def toJdbcSink(
      rollup: DataFrame,
      url: String,
      table: String,
      props: Properties,
      checkpoint: String,
      maxRetries: Int = 3,
      backoffMs: Long = 100L
  ): DataStreamWriter[Row] =
    rollup
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeAppend(batch, url, table, props, maxRetries, backoffMs)
      }

  def readTable(
      spark: SparkSession,
      url: String,
      table: String,
      props: Properties
  ): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Read with the B2 last-writer-wins contract applied: whatever
    * duplicates at-least-once delivery parked in the table, one row
    * per key comes back — the read the reference performs as `FINAL`
    * over its ReplacingMergeTree.
    */
  def readLatest(
      spark: SparkSession,
      url: String,
      table: String,
      props: Properties,
      keys: Seq[String],
      versionCol: String
  ): DataFrame =
    CandleOps.latestByKey(readTable(spark, url, table, props), keys, versionCol)
}
