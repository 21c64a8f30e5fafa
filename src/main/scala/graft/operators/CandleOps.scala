package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Core relational operators of the engine, generic over column names.
  *
  * All pure `DataFrame => DataFrame`, built only on
  * `org.apache.spark.sql.functions` (codegen'd, partial-aggregation-
  * friendly); no UDFs, no collects. Each maps a reference behavior
  * (SURVEY.md §2 ids in the scaladoc).
  */
object CandleOps {

  /** Exact, order-independent sum of a 2-decimal double column: cast to
    * decimal so partial/final aggregation order cannot perturb the
    * result, finish back to double. This is what makes double sums
    * hash-identical between Spark and the DuckDB oracle regardless of
    * partitioning — the engine-side analog of summing cents.
    */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  // ---------------------------------------------------------------------
  // B2 — last-writer-wins dedup ("FINAL" over ReplacingMergeTree,
  // reference: app/clickhouse_schema.py:143,145).
  // ---------------------------------------------------------------------

  /** Keep, per key, the row with the max `versionCol`. Implemented as a
    * ranked window; Catalyst's InferWindowGroupLimit turns the
    * rank-then-filter into a per-partition top-1 (no full sort of each
    * key group materialized). One shuffle on the key — unavoidable, and
    * at 100 TB it is the same shuffle a groupBy-based dedup would pay.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Same semantics via hash aggregation (`groupBy(keys).max_by(...)`)
    * — partial aggregation halves shuffle volume vs the window form
    * when duplicates are common; preferred at scale when only listed
    * payload columns are needed.
    */
  def latestByKeyAgg(
      df: DataFrame,
      keys: Seq[String],
      versionCol: String,
      payload: Seq[String]
  ): DataFrame = {
    val aggs = payload.map(c => max_by(col(c), col(versionCol)).as(c)) :+
      max(col(versionCol)).as(versionCol)
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  // ---------------------------------------------------------------------
  // A5 — per-grain OHLCV aggregation (the flagship; reference MV SQL
  // app/clickhouse_schema.py:167-206, bucket expr :82-91).
  // ---------------------------------------------------------------------

  /** Tumbling-window OHLCV rollup: argMin(open)/max/min/argMax(close)/
    * sum(volume)/count. `window(ts, grain)` keeps the bucket expression
    * inside whole-stage codegen and Catalyst plans a single partial+final
    * hash aggregate (map-side combine → one shuffle on the group keys).
    *
    * With `withCarriers=true` the output keeps `open_ts`/`close_ts`, the
    * argmin/argmax carriers that make coarser re-aggregation associative
    * (the ClickHouse `-State` trick, SURVEY.md §1.3), plus an exact
    * decimal `volume_dec` for further summation.
    */
  def ohlcvRollup(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      grain: String,
      withCarriers: Boolean = false
  ): DataFrame = {
    val ts = col(tsCol)
    val v = col(valueCol)
    val grouped = df.groupBy(
      keys.map(col) :+ graft.functions.TimeBucket.time_bucket(ts, grain).as("bucket_ts"): _*
    )
    val base = Seq(
      min_by(v, ts).as("open"),
      max(v).as("high"),
      min(v).as("low"),
      max_by(v, ts).as("close"),
      count(lit(1)).as("trades")
    )
    val extra =
      if (withCarriers)
        Seq(
          min(ts).as("open_ts"),
          max(ts).as("close_ts"),
          sum(v.cast(DecimalType(18, 2))).as("volume_dec")
        )
      else Seq(moneySum(v).as("volume"))
    grouped.agg((base ++ extra).head, (base ++ extra).tail: _*)
  }

  /** A6 — cascade re-aggregation: coarser rollup from a finer rollup's
    * carrier columns (reference: app/clickhouse_schema.py:169-177
    * `-MergeState` cascade 1m→5m→…→1d). Associative merge: the result
    * is provably identical to rolling the base data up directly (the
    * commutativity the reference's MV design assumes; unit-tested).
    */
  def cascadeRollup(
      rollup: DataFrame,
      keys: Seq[String],
      bucketCol: String,
      grain: String
  ): DataFrame = {
    val grouped = rollup.groupBy(
      keys.map(col) :+ graft.functions.TimeBucket.time_bucket(col(bucketCol), grain).as("bucket_ts"): _*
    )
    grouped
      .agg(
        min_by(col("open"), col("open_ts")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("close_ts")).as("close"),
        count(lit(1)).as("buckets"),
        sum(col("trades")).as("trades"),
        min(col("open_ts")).as("open_ts"),
        max(col("close_ts")).as("close_ts"),
        sum(col("volume_dec")).as("volume_dec")
      )
  }

  /** Finish a carrier rollup to its user-facing shape (drop carriers,
    * decimal volume → double) — the analog of ClickHouse `-Merge`
    * read-side finishing (notebooks/ohlcv_views.ipynb cell 2).
    */
  def finishRollup(df: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = keys.map(col) ++ Seq(
      col("bucket_ts"),
      col("open"),
      col("high"),
      col("low"),
      col("close"),
      col("volume_dec").cast(DoubleType).as("volume"),
      col("trades").cast(LongType).as("trades")
    )
    df.select(cols: _*)
  }

  // ---------------------------------------------------------------------
  // Snapshots / lookups (B1, B3-B5, W1; A1-A4)
  // ---------------------------------------------------------------------

  /** B1/W1 — recent-window snapshot: ORDER BY ts DESC LIMIT n with a
    * total-order tiebreak. Plans as TakeOrderedAndProjectExec (per-
    * partition top-k + driver merge; no global sort).
    */
  def recentTopK(df: DataFrame, n: Int, ordering: Seq[Column]): DataFrame =
    df.orderBy(ordering: _*).limit(n)

  /** B4/G4-support — latest row per key via max_by (hash agg, partial
    * combine; cheaper than window+filter when payload is narrow).
    */
  def latestPerKey(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payload: Seq[String]
  ): DataFrame = {
    val aggs = payload.map(c => max_by(col(c), col(tsCol)).as(c)) :+
      max(col(tsCol)).as(s"last_$tsCol")
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** A1 — earliest bucket per key (backfill resume point,
    * reference: app/load_history.py:277-295).
    */
  def earliestPerKey(df: DataFrame, keys: Seq[String], tsCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(min(col(tsCol)).as(s"earliest_$tsCol"))

  /** A2 — available source window: min/max/count for one key slice
    * (reference: app/data_quality_check.py:512-521).
    */
  def minMaxWindow(df: DataFrame, predicate: Column, tsCol: String): DataFrame =
    df.filter(predicate)
      .agg(
        min(col(tsCol)).as("window_start"),
        max(col(tsCol)).as("window_end"),
        count(lit(1)).as("n_rows")
      )

  /** G5 — floor timestamps to a grain (pd.Timestamp.floor analog,
    * reference: app/data_quality_check.py:309-310). Codegen'd single
    * expression — no named_struct construction.
    */
  def floorToGrain(ts: Column, grain: String): Column =
    graft.functions.TimeBucket.time_bucket(ts, grain)

  // ---------------------------------------------------------------------
  // Technical indicators over a rolled-up candle frame — the natural
  // read-side extension of the reference's OHLCV views
  // (notebooks/ohlcv_views.ipynb computes rolling stats per pair).
  // Every value is bit-reproducible across engines: rolling sums are
  // exact cents integers; the only float operations are single IEEE
  // divisions of exact operands, correctly-rounded sqrt, and one
  // add/sub per band — each deterministic given identical operands.
  // One sort-window exchange per key; frames never materialize beyond
  // the running sums Catalyst keeps.
  // ---------------------------------------------------------------------

  /** Bollinger bands: rolling mid (mean) and +/- k population-sigma
    * bands over the trailing `nWindow` closes, in cents. Short
    * prefixes use the actual frame size. The variance never divides
    * early: num = n*sxx - sx*sx stays an exact long until the final
    * double division by n*n.
    */
  def bollinger(
      rollup: DataFrame,
      keys: Seq[String],
      bucketCol: String,
      closeCol: String,
      nWindow: Int,
      k: Int
  ): DataFrame = {
    require(nWindow > 1, s"nWindow=$nWindow must exceed 1")
    require(k > 0, s"k=$k must be positive")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(bucketCol))
      .rowsBetween(-(nWindow - 1), Window.currentRow)
    val cents = round(col(closeCol) * 100).cast(LongType)
    val n = count(lit(1)).over(w)
    val sx = sum(cents).over(w)
    val sxx = sum(cents * cents).over(w)
    val mid = sx.cast(DoubleType) / n.cast(DoubleType)
    val delta = lit(k) *
      sqrt((n * sxx - sx * sx).cast(DoubleType) / (n * n).cast(DoubleType))
    rollup.select(
      (keys.map(col) :+ col(bucketCol) :+ cents.as("close_cents") :+
        n.as("n_in_frame") :+ mid.as("mid_cents") :+
        (mid + delta).as("upper_cents") :+ (mid - delta).as("lower_cents")): _*)
  }

  /** Simple (Cutler's) RSI: 100 * gains / (gains + losses) over the
    * trailing `nWindow` close-to-close moves. Gains/losses are exact
    * cent sums; the single division happens after the integer
    * multiply by 100, so the value is one IEEE division of exact
    * longs. A flat window (no moves) yields NULL, not 0/0.
    */
  def rsi(
      rollup: DataFrame,
      keys: Seq[String],
      bucketCol: String,
      closeCol: String,
      nWindow: Int
  ): DataFrame = {
    require(nWindow > 1, s"nWindow=$nWindow must exceed 1")
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(col(bucketCol))
    val w = wOrd.rowsBetween(-(nWindow - 1), Window.currentRow)
    val cents = round(col(closeCol) * 100).cast(LongType)
    val d = cents - lag(cents, 1).over(wOrd)
    val withD = rollup.select(
      (keys.map(col) :+ col(bucketCol) :+ d.as("__d")): _*)
    val gains = sum(when(col("__d") > 0, col("__d")).otherwise(0L)).over(w)
    val losses = sum(when(col("__d") < 0, -col("__d")).otherwise(0L)).over(w)
    withD.select(
      (keys.map(col) :+ col(bucketCol) :+ gains.as("gains_cents") :+
        losses.as("losses_cents") :+
        when(gains + losses === 0, lit(null).cast(DoubleType))
          .otherwise((gains * 100).cast(DoubleType) /
            (gains + losses).cast(DoubleType)).as("rsi")): _*)
  }

  /** Resample a rollup onto a continuous per-key grid and forward-fill
    * the close (pandas `resample(...).ffill()` / ClickHouse `WITH FILL`
    * analog — the read-side companion of G2's gap detection: instead of
    * *reporting* missing buckets, emit them carrying the last observed
    * close). Output: keys, bucket_ts, close (filled), filled flag.
    *
    * Shape at scale: one hash aggregate for per-key spans (shuffle on
    * keys), `sequence`+`explode` grid generation (no shuffle, rows
    * materialize in the mappers), one shuffle join grid×rollup on
    * (keys, bucket), one keys-partitioned window for the fill. Grid
    * size is bounded by span/grain per key — the same bound G2's
    * expected-grid anti-join already carries; a key with a pathological
    * span costs span/grain rows, never rows². The rollup input is
    * scanned twice (spans + join); at 100 TB the rollup this runs over
    * is grain-compacted (orders of magnitude under the base table), so
    * the second scan is cheap relative to one base-table pass.
    */
  def resampleFfill(
      rollup: DataFrame,
      keys: Seq[String],
      bucketCol: String,
      closeCol: String,
      grain: String
  ): DataFrame = {
    val step = graft.model.Timeframe.parse(grain).seconds
    val spans = rollup
      .groupBy(keys.map(col): _*)
      .agg(min(col(bucketCol)).as("__mn"), max(col(bucketCol)).as("__mx"))
    val grid = spans.select(
      keys.map(col) :+ explode(
        sequence(col("__mn"), col("__mx"),
          expr(s"INTERVAL $step seconds"))).as(bucketCol): _*)
    val joined = grid.join(
      rollup.select((keys.map(col) :+ col(bucketCol) :+ col(closeCol)): _*),
      keys :+ bucketCol, "left")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      (keys.map(col) :+ col(bucketCol) :+
        last(col(closeCol), ignoreNulls = true).over(w).as(closeCol) :+
        col(closeCol).isNull.as("filled")): _*)
  }

  /** Truncated exponential moving average in exact integer arithmetic.
    *
    * Weights are the EWMA series (1-a)^j with a = 2/(n+1), truncated at
    * the trailing `nWindow` rows and renormalized over the rows present
    * (pandas `ewm(span=n, adjust=True)` restricted to a window) — the
    * truncation is what makes the value exactly computable: scaling by
    * (n+1)^(n-1) turns every weight into the integer
    * (n-1)^j * (n+1)^(n-1-j), so numerator and denominator are exact
    * DECIMAL(38,0) sums over explicit `lag`s and the published `ema` is
    * ONE IEEE division of two exactly-representable integers — bit-
    * reproducible across engines and partitionings, like [[rsi]] and
    * [[bollinger]]. nWindow ≤ 20 keeps the worst-case numerator
    * (n·(n+1)^(n-1)·maxCents) under the decimal(38,0) cap for cent
    * values to ~1e12.
    *
    * One window per key — the same single-exchange shape as the other
    * indicators; the n explicit lags stay inside one codegen'd window
    * frame (no self-joins, no per-row arrays).
    */
  def ema(
      rollup: DataFrame,
      keys: Seq[String],
      bucketCol: String,
      closeCol: String,
      nWindow: Int
  ): DataFrame = {
    require(nWindow > 1 && nWindow <= 20,
      s"nWindow=$nWindow outside (1, 20]: weights (n+1)^(n-1) must stay decimal-exact")
    val dec = DecimalType(38, 0)
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(col(bucketCol))
    val cents = round(col(closeCol) * 100).cast(LongType)
    // integer weights (n-1)^j * (n+1)^(n-1-j), j = 0 (current row) .. n-1
    val weights = (0 until nWindow).map { j =>
      BigInt(nWindow - 1).pow(j) * BigInt(nWindow + 1).pow(nWindow - 1 - j)
    }
    val terms = weights.zipWithIndex.map { case (wj, j) =>
      val x = if (j == 0) cents else lag(cents, j).over(wOrd)
      val wLit = lit(BigDecimal(wj)).cast(dec)
      (when(x.isNotNull, x.cast(dec) * wLit).otherwise(lit(0).cast(dec)),
        when(x.isNotNull, wLit).otherwise(lit(0).cast(dec)))
    }
    val num = terms.map(_._1).reduce(_ + _).cast(dec)
    val den = terms.map(_._2).reduce(_ + _).cast(dec)
    rollup.select(
      (keys.map(col) :+ col(bucketCol) :+ cents.as("close_cents") :+
        (num.cast(DoubleType) / den.cast(DoubleType)).as("ema_cents")): _*)
  }
}
