package graft.model

import java.sql.Timestamp

/** Core data model of the engine — the OHLCV candle.
  *
  * Mirrors the reference base table
  * (reference: app/clickhouse_schema.py:123-147): one row per
  * (exchange, symbol, interval, start) key, versioned by
  * `receipt_timestamp` (the `ReplacingMergeTree(receipt_timestamp)`
  * dedup column, app/clickhouse_schema.py:143).
  */
final case class Candle(
    exchange: String,
    symbol: String,
    interval: String,
    start: Timestamp,
    stop: Timestamp,
    close_unixtime: Long,
    trades: Int,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Double,
    timestamp: Timestamp,
    receipt_timestamp: Timestamp
)

/** Finished-value rollup row with argmin/argmax carrier timestamps
  * (SURVEY.md §1.3): `open_ts`/`close_ts` make re-aggregation to a
  * coarser grain associative, the same trick ClickHouse plays with
  * `AggregateFunction(argMin, ...)` states
  * (reference: app/clickhouse_schema.py:149-164).
  */
final case class RollupRow(
    exchange: String,
    symbol: String,
    candle_start: Timestamp,
    open: Double,
    open_ts: Timestamp,
    high: Double,
    low: Double,
    close: Double,
    close_ts: Timestamp,
    volume: Double,
    trades: Long
)

/** Timeframe grammar `^(\d+)([smhdw])$`, the same grammar the reference
  * parses (reference: app/load_history.py:238-260 `parse_timeframe_delta`,
  * app/data_quality_check.py:55-76 `timeframe_to_pandas_freq`).
  */
final case class Timeframe(n: Int, unit: Char) {
  require(n > 0, s"timeframe count must be positive: $n")

  val unitSeconds: Long = unit match {
    case 's' => 1L
    case 'm' => 60L
    case 'h' => 3600L
    case 'd' => 86400L
    case 'w' => 604800L
    case u   => throw new IllegalArgumentException(s"bad timeframe unit: $u")
  }

  /** Total span in seconds (e.g. "15m" -> 900). */
  def seconds: Long = n * unitSeconds

  /** Spark interval string usable in `window(col, duration)` /
    * `expr("INTERVAL ...")`, e.g. "15 minutes".
    */
  def sparkInterval: String = unit match {
    case 's' => s"$n seconds"
    case 'm' => s"$n minutes"
    case 'h' => s"$n hours"
    case 'd' => s"$n days"
    case 'w' => s"${n * 7} days"
  }

  def label: String = s"$n$unit"

  /** The reference's rollup-cascade divisibility check
    * (app/clickhouse_schema.py:98-99): a coarser grain must be an
    * integer multiple of its parent.
    */
  def divides(coarser: Timeframe): Boolean =
    coarser.seconds % seconds == 0
}

object Timeframe {
  private val Grammar = """^(\d+)([smhdw])$""".r

  def parse(s: String): Timeframe = s.trim match {
    case Grammar(n, u) => Timeframe(n.toInt, u.head)
    case other =>
      throw new IllegalArgumentException(s"unparseable timeframe: '$other'")
  }

  /** The reference's maintained rollup grains, `ROLLUP_MINUTES`
    * (app/clickhouse_schema.py:29): 1m 5m 15m 30m 1h 2h 4h 1d.
    */
  val RollupGrains: Seq[Timeframe] =
    Seq(1, 5, 15, 30, 60, 120, 240, 1440).map { m =>
      if (m % 1440 == 0) Timeframe(m / 1440, 'd')
      else if (m % 60 == 0) Timeframe(m / 60, 'h')
      else Timeframe(m, 'm')
    }
}
