package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Gap-detection / time-grid machinery — the Spark-native restatement of
  * the reference's pandas mini-engine (`find_missing_dates` resample +
  * isna, app/data_quality_check.py:206-251; `group_missing_ranges`
  * :264-288; freshness watchdog :111-141; backfill chunk planner
  * app/load_history.py:374-408).
  *
  * Design for scale: grids are generated per key from that key's own
  * [min,max] bounds (`sequence` + `explode` — distributed, no driver
  * loop), then anti-joined against observations. Both sides are
  * pre-bucketed and deduped before the join so the shuffle carries one
  * row per (key, bucket), not one per raw event.
  */
object GapOps {

  /** Distinct observed buckets per key at `grain` (a date_trunc-style
    * floor). One partial+final aggregate; feeds G2/G3/G4.
    */
  def observedBuckets(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      grain: String
  ): DataFrame =
    df.select(keys.map(col) :+ CandleOps.floorToGrain(col(tsCol), grain).as("bucket_ts"): _*)
      .distinct()

  /** G2 — expected-grid anti-join (flagship #2): per key, the grid
    * buckets between that key's min and max that have no observation.
    * `sequence()` synthesizes the grid distributively (beats pandas
    * resample: no single-machine materialization), `left_anti` is the
    * `.asfreq().isna()` analog.
    */
  def missingBuckets(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      grain: String
  ): DataFrame = {
    val obs = observedBuckets(df, keys, tsCol, grain)
    val grid = obs
      .groupBy(keys.map(col): _*)
      .agg(min(col("bucket_ts")).as("__lo"), max(col("bucket_ts")).as("__hi"))
      .select(
        keys.map(col) :+ explode(
          sequence(col("__lo"), col("__hi"), expr(s"INTERVAL $grain"))
        ).as("bucket_ts"): _*
      )
    grid.join(obs, keys :+ "bucket_ts", "left_anti")
  }

  /** W4/G3 — gaps-and-islands: collapse per-key observed buckets into
    * maximal contiguous runs. lag → new-island flag → running sum as
    * island id → min/max per island. One shuffle (window partition by
    * key); the running sum stays in the same window partition, so no
    * second shuffle.
    */
  def islandRanges(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      grain: String,
      stepSeconds: Long
  ): DataFrame = {
    val obs = observedBuckets(df, keys, tsCol, grain)
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket_ts"))
    val withIsland = obs
      .withColumn("__prev", lag(col("bucket_ts"), 1).over(byKey))
      .withColumn(
        "__new_island",
        when(
          col("__prev").isNull ||
            unix_timestamp(col("bucket_ts")) - unix_timestamp(col("__prev")) > stepSeconds,
          lit(1)
        ).otherwise(lit(0))
      )
      .withColumn(
        "island_id",
        sum(col("__new_island")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
    withIsland
      .groupBy(keys.map(col) :+ col("island_id"): _*)
      .agg(
        min(col("bucket_ts")).as("range_start"),
        max(col("bucket_ts")).as("range_end"),
        count(lit(1)).as("n_buckets")
      )
  }

  /** G4 — freshness: per key, microseconds of lag between its latest
    * event and a reference "now" (a literal anchor for determinism —
    * the reference's hardcoded 2-minute SLO lives at
    * app/data_quality_check.py:130).
    */
  def freshnessLag(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      anchor: Column,
      staleThresholdUs: Long
  ): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(max(col(tsCol)).as("last_ts"))
      .withColumn("lag_us", unix_micros(anchor) - unix_micros(col("last_ts")))
      .withColumn("is_stale", (col("lag_us") > staleThresholdUs).cast("boolean"))

  /** G6 — expected bucket count for a [start,end) range at a step, the
    * verification arithmetic of app/data_quality_check.py:495-500.
    */
  def expectedBucketCount(rangeStart: Column, rangeEnd: Column, stepSeconds: Long): Column =
    floor((unix_micros(rangeEnd) - unix_micros(rangeStart)) / lit(stepSeconds * 1000000L))
      .cast(LongType)

  /** P4 — backfill chunk planner: per key, chunk bounds walking from a
    * global `startDate` up to the key's earliest observed bucket in
    * `chunk` steps (reference walks backwards, app/load_history.py:
    * 374-408; the emitted set of [chunk_start, chunk_end) ranges is
    * identical either direction). Chunks are synthesized with
    * `sequence`/`explode` — the planner itself is a distributed query,
    * not a driver loop.
    */
  def backfillChunks(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      startDate: Column,
      grain: String,
      chunk: String
  ): DataFrame = {
    val earliest = df
      .groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("__min_ts"))
      .select(keys.map(col) :+ CandleOps.floorToGrain(col("__min_ts"), grain).as("earliest_ts"): _*)
    earliest
      .filter(col("earliest_ts") > startDate)
      .select(
        keys.map(col) :+ col("earliest_ts") :+ explode(
          sequence(startDate, col("earliest_ts"), expr(s"INTERVAL $chunk"))
        ).as("chunk_start"): _*
      )
      .filter(col("chunk_start") < col("earliest_ts"))
      .withColumn(
        "chunk_end",
        least(col("chunk_start") + expr(s"INTERVAL $chunk"), col("earliest_ts"))
      )
      .drop("earliest_ts")
  }

  /** R4/R5 — the reference's full data-quality loop as ONE query: for
    * every maintained rollup grain, the missing-bucket ranges per key
    * (reference: app/data_quality_check.py:583-633 runs the gap scan
    * per rollup table every cycle).
    *
    * Scale design: the raw events are bucketed ONCE at the finest
    * grain (distinct (key, bucket) — the same shape as the 1m rollup
    * store), then ONE lag-window over that set serves every grain.
    * Two facts carry the whole scan:
    *  - a missing range is exactly the space between two CONSECUTIVE
    *    observed buckets more than one step apart — one lag over the
    *    rollup-sized observed set. Never materialize the missing grid:
    *    a sparse key at a fine grain would explode it (measured 6M+
    *    grid rows and a window over all of them at sf0.01);
    *  - every coarse-grain gap is visible in a finest-grain gap pair:
    *    `floor(b,g) − floor(prev,g) > g` forces `b − prev > finest`
    *    (b ≥ its floor, prev ≤ its floor + g − finest), and each
    *    maximal missing run at grain g comes from exactly ONE finest
    *    pair — the last observed finest bucket in the run's left
    *    neighbor and the first in its right neighbor are consecutive,
    *    since any finest bucket between them would sit in a coarse
    *    bucket inside the run. So: lag once at the finest grain, keep
    *    only the gap pairs, explode those few rows across grains, and
    *    a per-grain floor comparison (plain codegen filter, no second
    *    window, no per-grain distinct) yields every grain's ranges.
    *
    * 8 grains cost one scan of the events, one distinct, and ONE
    * window exchange — not 8 distincts + 8 windows + an 8-way union.
    * All grains are fixed-seconds (Timeframe bans calendar units), so
    * micros arithmetic ≡ INTERVAL arithmetic in the UTC-pinned session.
    *
    * Output: (keys..., grain, range_start, range_end, n_missing), one
    * row per maximal run of missing buckets per key per grain.
    */
  def multiGrainGapScan(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      grains: Seq[graft.model.Timeframe]
  ): DataFrame = {
    val finest = grains.minBy(_.seconds)
    require(grains.forall(g => finest.divides(g)),
      s"all grains must be integer multiples of the finest (${finest.label})")
    val finestStepUs = finest.seconds * 1000000L
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col("__fb"))
    val gapPairs = observedBuckets(df, keys, tsCol, finest.sparkInterval)
      .withColumnRenamed("bucket_ts", "__fb")
      .withColumn("__prev", lag(col("__fb"), 1).over(byKey))
      .filter(col("__prev").isNotNull &&
        unix_micros(col("__fb")) - unix_micros(col("__prev")) > finestStepUs)
    // one struct per grain per gap pair; step carried as a column so
    // the range arithmetic below is grain-generic
    val grainStructs = array(grains.map { g =>
      def fl(c: Column): Column =
        if (g.seconds == finest.seconds) c
        else CandleOps.floorToGrain(c, g.sparkInterval)
      struct(
        lit(g.label).as("grain"),
        lit(g.seconds * 1000000L).as("step_us"),
        fl(col("__prev")).as("prev_b"),
        fl(col("__fb")).as("cur_b"))
    }: _*)
    gapPairs
      .select(keys.map(col) :+ explode(grainStructs).as("__g"): _*)
      .filter(unix_micros(col("__g.cur_b")) - unix_micros(col("__g.prev_b")) > col("__g.step_us"))
      .select(
        keys.map(col) :+ col("__g.grain").as("grain") :+
          timestamp_micros(unix_micros(col("__g.prev_b")) + col("__g.step_us")).as("range_start") :+
          timestamp_micros(unix_micros(col("__g.cur_b")) - col("__g.step_us")).as("range_end") :+
          (((unix_micros(col("__g.cur_b")) - unix_micros(col("__g.prev_b"))) / col("__g.step_us")) - 1L)
            .cast(LongType).as("n_missing"): _*)
  }

  /** P5 — listing diff: ids present on one side only, labeled. The
    * reference's only set operation (`current − known` / `known −
    * current`, app/data_collector.py:136-137). Two left-anti joins;
    * both sides deduped first so the join input is minimal.
    */
  def listingDiff(
      current: DataFrame,
      known: DataFrame,
      idCols: Seq[String]
  ): DataFrame = {
    val cur = current.select(idCols.map(col): _*).distinct()
    val kn = known.select(idCols.map(col): _*).distinct()
    val added = cur.join(kn, idCols, "left_anti").withColumn("status", lit("added"))
    val removed = kn.join(cur, idCols, "left_anti").withColumn("status", lit("removed"))
    added.unionByName(removed)
  }
}
