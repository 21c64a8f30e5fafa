package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Streaming drift gate — the ingest-time form of
  * [[graft.operators.EventOps.statsDrift]]: tumbling-window per-type
  * column stats compared against a STATIC baseline profile, emitting
  * one gate row per (window, type) once the watermark proves the
  * window complete. This is the monitor a collection service runs ON
  * the stream (reference behavior: the collector's health checks ride
  * the ingest path, app/data_collector.py's validation hooks), so a
  * producer that starts dropping `value` or shifting its range is
  * flagged within one window of wall clock, not at the next batch
  * audit.
  *
  * State shape: the baseline joins BEFORE aggregation as a broadcast
  * static enrich (rows carry a handful of per-type constants), so the
  * only streaming state is the windowed aggregate itself — counts and
  * min/max per (window, type), constant-size per key, expired by the
  * watermark. Null-rate drift is decided by the same exact
  * cross-multiplication as the batch gate; no float compares.
  */
object DriftStream {

  /** Batch companion: profile a history frame into the static baseline
    * the gate joins — per type: row count, null-value count, cents
    * range. One map-side-combinable aggregate.
    */
  def baselineProfile(
      events: DataFrame,
      typeCol: String,
      valueCol: String
  ): DataFrame = {
    val cents = round(col(valueCol) * 100).cast(LongType)
    events.groupBy(col(typeCol).as("event_type"))
      .agg(
        count(lit(1)).as("base_n"),
        sum(when(col(valueCol).isNull, 1L).otherwise(0L)).as("base_null"),
        min(cents).as("base_lo_cents"),
        max(cents).as("base_hi_cents"))
  }

  /** @param events         streaming events frame
    * @param windowLen      tumbling window, e.g. "1 hour"
    * @param watermark      lateness bound; windows emit once it passes
    * @param baseline       static profile from [[baselineProfile]]
    * @param thresholdMilli absolute null-rate shift (per mille) that
    *                       flags `null_drifted`
    * @return append-mode rows (window_start, event_type, n, n_null,
    *         lo_cents, hi_cents, null_drifted, range_breach)
    */
  def statsGate(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      valueCol: String,
      windowLen: String,
      watermark: String,
      baseline: DataFrame,
      thresholdMilli: Long = 50L
  ): DataFrame = {
    require(thresholdMilli > 0, s"thresholdMilli=$thresholdMilli must be positive")
    val dec = DecimalType(38, 0)
    val cents = round(col(valueCol) * 100).cast(LongType)
    val enriched = events
      .select(col(typeCol).as("event_type"), col(tsCol).as("__ts"),
        col(valueCol).as("__v"), cents.as("__cents"))
      .join(broadcast(baseline), Seq("event_type"), "left")
    val agg = enriched
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_null"),
        min(col("__cents")).as("lo_cents"),
        max(col("__cents")).as("hi_cents"),
        first(col("base_n")).as("__bn"),
        first(col("base_null")).as("__bnull"),
        first(col("base_lo_cents")).as("__blo"),
        first(col("base_hi_cents")).as("__bhi"))
    agg.select(
      col("window.start").as("window_start"),
      col("event_type"), col("n"), col("n_null"),
      col("lo_cents"), col("hi_cents"),
      // exact cross-multiply, identical to the batch gate: a type
      // absent from the baseline (null __bn) flags as drifted — a NEW
      // event type is itself a schema change worth waking someone for
      when(col("__bn").isNull, lit(true))
        .otherwise(
          abs(col("n_null").cast(dec) * col("__bn").cast(dec) -
            col("__bnull").cast(dec) * col("n").cast(dec)) * lit(1000L) >
            lit(thresholdMilli) * col("n").cast(dec) * col("__bn").cast(dec))
        .as("null_drifted"),
      when(col("__bn").isNull, lit(true))
        .otherwise(coalesce(
          col("lo_cents") < col("__blo") || col("hi_cents") > col("__bhi"),
          lit(false)))
        .as("range_breach"))
  }
}
