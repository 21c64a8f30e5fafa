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
    // layout-aware width pin on the session window's exchange (see
    // graft.api.Par): a window exchange has no partial aggregation to
    // lose, and spreadKeyed leaves bucketed-store inputs untouched
    // (EventBucketingSpec's zero-exchange sessionization contract).
    graft.api.Par.spreadKeyed(events, keys)
      .withColumn("__prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__new",
        when(col("__prev_us").isNull ||
          unix_micros(col(tsCol)) - col("__prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_n", sum(col("__new")).over(run))
      .drop("__prev_us", "__new")
  }

  /** Peak concurrency over activity intervals [startCol, endCol]
    * (closed: touching intervals count as concurrent — starts order
    * before ends at the same instant): the classic ±1 sweep, with the
    * running count computed by [[RankOps.distributedPrefixSum]] so the
    * global time order never collapses into one task. Two passes over
    * the swept frame (global max, then first instant reaching it) —
    * both full scans, no extra shuffle beyond the sweep's range
    * partitioning. Output: one row (peak_concurrency, first_peak_ts).
    */
  def peakConcurrency(
      sessions: DataFrame,
      startCol: String,
      endCol: String
  ): DataFrame = {
    val deltas = sessions
      .select(col(startCol).as("ts"), lit(1L).as("__d"))
      .unionByName(sessions.select(col(endCol).as("ts"), lit(-1L).as("__d")))
    // closed intervals: +1 sorts before -1 at equal ts (__d desc).
    // Materialized once: both the max pass and the argmax pass scan it
    val swept = RankOps.distributedPrefixSum(
      deltas, Seq(col("ts"), col("__d").desc), "__d", "concurrency")
      .localCheckpoint(true)
    val peak = broadcast(swept.agg(max(col("concurrency")).as("__peak")))
    swept.crossJoin(peak)
      .filter(col("concurrency") === col("__peak"))
      .groupBy(col("__peak").as("peak_concurrency"))
      .agg(min(col("ts")).as("first_peak_ts"))
  }

  /** Per-day union coverage of activity intervals [startCol, endCol):
    * how much of each day was SOMEONE active, and in how many
    * contiguous blocks. Cross-midnight intervals split at day bounds
    * (sequence/explode — sessions are short, pieces are ≤ a handful),
    * then the classic running-max-end island merge runs per day — the
    * window partitions by day, so a year of data is 365 independent
    * partitions, never one global sort. Exact microsecond arithmetic.
    */
  def dailyCoverage(
      sessions: DataFrame,
      startCol: String,
      endCol: String
  ): DataFrame = {
    val pieces = sessions
      .select(col(startCol).as("__s"), col(endCol).as("__e"))
      .filter(col("__e") >= col("__s"))
      .select(
        explode(sequence(date_trunc("day", col("__s")), date_trunc("day", col("__e")),
          expr("INTERVAL 1 day"))).as("day"),
        col("__s"), col("__e"))
      .select(col("day"),
        greatest(col("__s"), col("day")).as("__ps"),
        least(col("__e"), col("day") + expr("INTERVAL 1 day")).as("__pe"))
    val w = Window.partitionBy(col("day")).orderBy(col("__ps"), col("__pe"))
    val flagged = pieces
      .withColumn("__maxe",
        max(col("__pe")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__maxe").isNull || col("__ps") > col("__maxe"), 1L).otherwise(0L))
      .withColumn("__blk",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col("day"), col("__blk"))
      .agg(min(col("__ps")).as("__bs"), max(col("__pe")).as("__be"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(unix_micros(col("__be")) - unix_micros(col("__bs"))).as("covered_us"))
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
