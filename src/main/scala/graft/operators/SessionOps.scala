package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization over keyed event streams — the
  * user-behavior analog of the reference's gap detection (missing-range
  * collapse, app/data_quality_check.py:331: consecutive timestamps more
  * than one interval apart start a new run). Two formulations with
  * identical semantics, plus a streaming form:
  *
  *  - [[sessionSummaries]]: Spark's native `session_window` grouping —
  *    ONE shuffle on the keys with map-side partial session merging;
  *    works unchanged over a streaming frame (add a watermark).
  *  - [[assignSessions]]: per-event session index via lag + running
  *    count — for when every event needs its session id (joins back to
  *    raw events), at the cost of a per-key sort window.
  *
  * A new session starts when the gap to the previous event is STRICTLY
  * greater than the gap parameter: session_window merges an event that
  * lands exactly on the previous session's close (`ts <= prev_ts +
  * gap`, verified empirically in SessionOpsSpec), and both
  * formulations here share that inclusive boundary.
  */
object SessionOps {

  /** Per-session summary: keys, first/last event time, event count,
    * exact decimal-accumulated value total. `gap` is a calendar
    * interval string (e.g. "30 minutes").
    */
  def sessionSummaries(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      gap: String
  ): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        CandleOps.moneySum(col(valueCol)).as("total_value"))
      .select(keys.map(col) ++ Seq(
        col("session_start"), col("session_end"),
        col("n_events"), col("total_value")): _*)

  /** Streaming form: watermarked `session_window` aggregation in append
    * mode — sessions finalize once the watermark passes their close.
    * State per key is one open session, merged incrementally.
    */
  def streamingSessionSummaries(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      gap: String,
      watermark: String
  ): DataFrame =
    sessionSummaries(
      events.withWatermark(tsCol, watermark), keys, tsCol, valueCol, gap)

  /** Per-event session assignment: `session_n` numbers each key's
    * sessions from 1 in time order. Gap comparison is in exact
    * microseconds (never float seconds).
    */
  def assignSessions(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapSeconds: Long
  ): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds=$gapSeconds must be positive")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__new",
        when(col("__prev_us").isNull ||
          unix_micros(col(tsCol)) - col("__prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_n", sum(col("__new")).over(run))
      .drop("__prev_us", "__new")
  }

  /** Per-key bounce rate over a [[sessionSummaries]] frame: sessions,
    * single-event ("bounce") sessions, and their ratio — one hash
    * aggregate over the already-small session frame, one IEEE
    * division of two exact longs per key.
    */
  def bounceRate(sessions: DataFrame, keys: Seq[String]): DataFrame =
    sessions
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .withColumn("bounce_rate",
        col("n_bounces").cast("double") / col("n_sessions").cast("double"))

  /** Session-depth histogram over a [[sessionSummaries]] frame: how
    * many sessions saw exactly N events, and each depth's share of all
    * sessions — one hash aggregate over the session frame (depth
    * cardinality is tiny), share via a window sum over those rows.
    */
  def depthHistogram(sessions: DataFrame): DataFrame = {
    val hist = sessions
      .groupBy(col("n_events").as("depth"))
      .agg(count(lit(1)).as("n_sessions"))
    val w = Window.partitionBy()
    hist.withColumn("share",
      col("n_sessions").cast("double") /
        sum(col("n_sessions")).over(w).cast("double"))
  }
}
