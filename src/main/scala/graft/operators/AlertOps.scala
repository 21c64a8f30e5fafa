package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S7 — the alert side-channel as a query surface (reference:
  * app/telegram_notifier.py:39-60 and its call sites in
  * app/data_quality_check.py:313-335, :672-681).
  *
  * The reference formats quality findings (gaps found, stale symbols)
  * into notification messages; the transport (Telegram) is host glue,
  * but the ALERT ROWS are data — this operator derives them from the
  * same quality scans, as a deterministic DataFrame a sink (or a
  * StreamingQueryListener, see [[graft.streaming.AlertStream]]) can
  * deliver anywhere.
  *
  * One row per finding: (alert_type, severity, entity, grain, n,
  * detail). Pure projections over the quality-scan outputs — the scans
  * carry the heavy lifting and their scale story.
  */
object AlertOps {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  /** Gap findings above a noise floor → "gap" alerts.
    * @param gapScan output of [[GapOps.multiGrainGapScan]]
    */
  def gapAlerts(gapScan: DataFrame, keys: Seq[String], minMissing: Long): DataFrame =
    gapScan
      .filter(col("n_missing") >= minMissing)
      .select(
        lit("gap").as("alert_type"),
        lit("warn").as("severity"),
        concat_ws("/", keys.map(k => col(k).cast("string")): _*).as("entity"),
        col("grain"),
        col("n_missing").as("n"),
        format_string("missing %d buckets from %s to %s",
          col("n_missing"),
          date_format(col("range_start"), TsFmt),
          date_format(col("range_end"), TsFmt)).as("detail"))

  /** Staleness findings → "stale" alerts.
    * @param freshness output of [[GapOps.freshnessLag]]
    */
  def freshnessAlerts(freshness: DataFrame, keys: Seq[String]): DataFrame =
    freshness
      .filter(col("is_stale"))
      .select(
        lit("stale").as("alert_type"),
        lit("crit").as("severity"),
        concat_ws("/", keys.map(k => col(k).cast("string")): _*).as("entity"),
        lit(null).cast("string").as("grain"),
        col("lag_us").as("n"),
        format_string("no data since %s (lag %d s)",
          date_format(col("last_ts"), TsFmt),
          (col("lag_us") / 1000000L).cast("long")).as("detail"))

  /** The reference's full quality-alert pass as one query: gap scan
    * over every grain + freshness watchdog, unioned into one alert
    * feed.
    */
  def qualityAlerts(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      grains: Seq[graft.model.Timeframe],
      anchor: Column,
      staleThresholdUs: Long,
      minMissing: Long
  ): DataFrame = {
    val gaps = gapAlerts(GapOps.multiGrainGapScan(df, keys, tsCol, grains), keys, minMissing)
    val stale = freshnessAlerts(
      GapOps.freshnessLag(df, keys, tsCol, anchor, staleThresholdUs), keys)
    gaps.unionByName(stale)
  }
}
