package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-side validation and subscription planning — the Spark
  * restatement of the reference's CHECK constraints
  * (app/clickhouse_schema.py:139-142) and symbol filtering
  * (app/data_collector.py:59-94).
  */
object IngestOps {

  /** `isFinite(x)` — ClickHouse builtin, no single Spark builtin
    * (SURVEY.md §2.9): not NaN and not ±Inf. NULL-safe: null is not
    * finite.
    */
  def isFinite(c: Column): Column =
    c.isNotNull && !isnan(c) &&
      (c =!= lit(Double.PositiveInfinity)) && (c =!= lit(Double.NegativeInfinity))

  /** P3 — the four CHECK constraints of the base candle table as a
    * single validity predicate over generic OHLCV-ish columns:
    * `ohlc_finite`, `ohlc_order` (low <= least(o,c), high >=
    * greatest(o,c), low <= high), `close_time_positive`,
    * `keys_not_empty` (app/clickhouse_schema.py:139-142).
    */
  def candleChecks(
      open: Column, high: Column, low: Column, close: Column,
      volume: Column, closeUnixtime: Column, keys: Seq[Column]
  ): Column = {
    val finite = Seq(open, high, low, close, volume).map(isFinite).reduce(_ && _)
    val ordered = low <= least(open, close) && high >= greatest(open, close) && low <= high
    val timePos = closeUnixtime > 0
    val keysNonEmpty = keys.map(k => k.isNotNull && length(k) > 0).reduce(_ && _)
    finite && ordered && timePos && keysNonEmpty
  }

  /** Validation as a filter (rows violating any CHECK are dropped, the
    * insert-rejection analog). The predicate is a pure conjunction of
    * pushable comparisons — Catalyst pushes the sargable parts to the
    * parquet scan.
    */
  def validate(df: DataFrame, check: Column): DataFrame = df.filter(check)

  /** P2 — symbol filtering (app/data_collector.py:59-94): whitelist
    * takes priority; otherwise a substring match on the symbol-type;
    * blacklist always subtracted; output sorted. At scale both lists
    * are tiny literals → pushed-down `IN` / `LIKE` predicates, no join.
    */
  def filterSymbols(
      df: DataFrame,
      symbolCol: String,
      whitelist: Seq[String],
      symbolType: String,
      blacklist: Seq[String]
  ): DataFrame = {
    val sym = col(symbolCol)
    val selected =
      if (whitelist.nonEmpty) sym.isin(whitelist: _*)
      else sym.contains(symbolType)
    val notBlacklisted =
      if (blacklist.nonEmpty) !sym.isin(blacklist: _*) else lit(true)
    df.filter(selected && notBlacklisted).orderBy(sym)
  }
}
