package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global ranking. Spark's `ntile`/`row_number` over
  * an un-partitioned window collapse the whole frame into ONE task —
  * fine for a quintile over thousands of users, a dead stop for a
  * quintile over 1e9. This computes the identical result from a
  * range-repartitioned sort: local row_numbers per range partition,
  * plus broadcast per-partition offsets (one tiny count frame — rows =
  * #partitions, the only driver-independent global state needed).
  *
  * Exactness: `order` must be a TOTAL order (callers append the key as
  * tiebreak); then global rank = local rank + offset is unique and
  * identical to the single-partition result, and the ntile bucket is
  * pure integer arithmetic on (rank, N): the first N mod n buckets get
  * ceil(N/n) rows — Spark's and DuckDB's shared definition — so
  * results stay engine-reproducible.
  */
object RankOps {

  /** Exact weighted median per group: the smallest value v such that
    * the weight at-or-below v reaches half the group's total
    * (2·cumw ≥ W as an integer compare — no division, no doubles).
    * The statistic a token-budgeted corpus actually wants: with
    * weight = doc length, "the median byte lives in a doc of length
    * X", which mean/plain-median both misstate under skew.
    *
    * One window per group (cumulative + total share the same sort) and
    * one aggregate: the qualifying rows are a sorted suffix, so the
    * group min of qualifying values IS the first qualifying value.
    * Ties in `valueCol` are broken by `idCol` for a deterministic
    * cumulative order; the RESULT is tie-independent (equal values
    * contribute interchangeable weight).
    */
  def weightedMedian(
      df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      idCol: String
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = groupCols.map(col)
    val ord = Window.partitionBy(keys: _*).orderBy(col(valueCol), col(idCol))
    val cum = sum(col(weightCol)).over(
      ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val tot = sum(col(weightCol)).over(
      Window.partitionBy(keys: _*))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select((keys :+ col(valueCol) :+ cum.as("__cw") :+ tot.as("__tw")): _*)
      .filter(col("__cw") * 2 >= col("__tw"))
      .groupBy(keys: _*)
      .agg(min(col(valueCol)).as("weighted_median"),
        max(col("__tw")).as("total_weight"))
  }

  /** Append `outCol` = the global running sum of `valueCol` over
    * `order` — the distributed prefix sum behind interval sweeps
    * (concurrency counting), cumulative distributions, and any "state
    * at time t" scan. Same two-phase trick as [[distributedRank]]:
    * local prefix sums per range partition + broadcast partition-total
    * offsets; never a single-partition window.
    *
    * Determinism: rows tying on the full `order` must have COMMUTING
    * values (equal, or summed the same either way — true for sweep
    * deltas where ties carry the same delta); then every prefix value
    * is order-independent.
    */
  def distributedPrefixSum(
      df: DataFrame,
      order: Seq[Column],
      valueCol: String,
      outCol: String
  ): DataFrame = {
    val byRange = df.repartitionByRange(order: _*)
      .withColumn("__ps_pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__ps_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = byRange.withColumn("__ps_ls", sum(col(valueCol)).over(wLocal))
    val totals = local.groupBy(col("__ps_pid")).agg(sum(col(valueCol)).as("__ps_t"))
    val wOff = Window.orderBy(col("__ps_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__ps_off", coalesce(sum(col("__ps_t")).over(wOff), lit(0L)))
      .select(col("__ps_pid"), col("__ps_off"))
    local.join(broadcast(offsets), "__ps_pid")
      .withColumn(outCol, col("__ps_off") + col("__ps_ls"))
      .drop("__ps_pid", "__ps_ls", "__ps_off")
  }

  /** Range-partitioned local row_numbers plus the broadcastable
    * (#partitions)-row offset/total frame — the shared core of
    * [[distributedRank]] and [[distributedNtile]].
    *
    * Local rank comes from the sorted-iterator id, not a window: a
    * `Window.partitionBy(pid)` would RE-shuffle the full data (hash on
    * pid satisfies nothing the range exchange produced), while after
    * sortWithinPartitions the local rank is just
    * `monotonically_increasing_id`'s documented low 33 record-index
    * bits (`id − (pid << 33) + 1`) — zero extra exchange. The counts
    * branch reads the SAME range shuffle (identical exchange,
    * runtime-reused) and partial-aggregates unsorted. Same
    * construction as [[exactPercentilesCont]], whose RankOpsSpec
    * bit-identity tests (with this suite's rank/ntile pins) go red if
    * the id layout ever changes; partitions past 2^33 rows would
    * break it too, but a single 8.6-billion-row task is far past any
    * sane split.
    */

  /** The session's configured shuffle parallelism — the explicit
    * numPartitions for every range exchange here. A bare
    * `repartitionByRange(order)` resolves to the same number but is
    * AQE-coalescible (REPARTITION_BY_COL origin), and byte-sized
    * coalescing was folding the rank/percentile compute stages into
    * ONE task at sf0.1 (round-15 profile: q_equidepth_hist's 8 MB
    * range stage single-task at 0.53 s on 32 cores). An explicit count
    * pins the width; correctness is partitioning-independent by
    * construction (any contiguous range split works — the pid
    * offset/count frames adapt, RankOpsSpec bit-identity pins it).
    */
  private def rangeWidth(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  private def localRanks(
      df: DataFrame,
      order: Seq[Column],
      pinWidth: Boolean): (DataFrame, DataFrame) = {
    // pinWidth: explicit session-width range exchange (uncoalescible)
    // for RAW-FACT inputs where the rank stage is the compute bill;
    // default off — on small post-aggregate frames (q_rfm's per-user
    // quintiles: ~1k rows at sf0.1) the 32-wide fixed per-task costs
    // measured SLOWER than AQE's coalesced single task
    // (0.93 -> 1.79 s, round-15), so AQE keeps sizing those.
    def part(d: DataFrame): DataFrame =
      if (pinWidth) d.repartitionByRange(rangeWidth(d), order: _*)
      else d.repartitionByRange(order: _*)
    val local = part(df)
      .sortWithinPartitions(order: _*)
      .withColumn("__rk_pid", spark_partition_id())
      .withColumn("__rk_lr",
        monotonically_increasing_id() -
          shiftleft(col("__rk_pid").cast("long"), 33) + lit(1L))
    val counts = part(df)
      .withColumn("__rk_pid", spark_partition_id())
      .groupBy(col("__rk_pid")).agg(count(lit(1)).as("__rk_cnt"))
    // offsets and the grand total over the #partitions-row frame; the
    // un-partitioned window here is over partition COUNTS, not data
    val wOff = Window.orderBy(col("__rk_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy()
    val offsets = counts
      .withColumn("__rk_off", coalesce(sum(col("__rk_cnt")).over(wOff), lit(0L)))
      .withColumn("__rk_n", sum(col("__rk_cnt")).over(wTot))
      .select(col("__rk_pid"), col("__rk_off"), col("__rk_n"))
    (local, offsets)
  }

  /** Append `outCol` = global row_number (1-based) over the TOTAL
    * order `order` — identical to the single-partition window result,
    * computed distributed.
    */
  def distributedRank(
      df: DataFrame,
      order: Seq[Column],
      outCol: String,
      pinWidth: Boolean = false): DataFrame = {
    val (local, offsets) = localRanks(df, order, pinWidth)
    local.join(broadcast(offsets), "__rk_pid")
      .withColumn(outCol, col("__rk_off") + col("__rk_lr"))
      .drop("__rk_pid", "__rk_lr", "__rk_off", "__rk_n")
  }

  def distributedNtile(
      df: DataFrame,
      order: Seq[Column],
      buckets: Int,
      outCol: String,
      pinWidth: Boolean = false
  ): DataFrame = {
    require(buckets >= 1, s"buckets=$buckets must be positive")
    val (local, offsets) = localRanks(df, order, pinWidth)
    val rank = col("__rk_off") + col("__rk_lr")
    // ntile: q = N / n, rem = N % n; first rem buckets hold q+1 rows.
    // The divisions run as IEEE doubles + floor — exact for any
    // operands under 2^53 (a non-integer quotient a/b sits >= 1/b from
    // the nearest integer, far outside half-ulp range)
    val q = floor(col("__rk_n") / buckets).cast("long")
    val rem = col("__rk_n") % buckets
    val bucket = when(rank <= (q + 1) * rem,
      floor((rank - 1) / (q + 1)).cast("long") + 1)
      .otherwise(rem + floor((rank - 1 - rem * (q + 1)) / q).cast("long") + 1)
    local.join(broadcast(offsets), "__rk_pid")
      .withColumn(outCol, bucket.cast("int"))
      .drop("__rk_pid", "__rk_lr", "__rk_off", "__rk_n")
  }

  /** Exact INTERPOLATED percentiles (percentile_cont) per group via a
    * spillable sort-window rank selection. Spark's builtin
    * `percentile()` aggregate collects every group value into one
    * in-memory aggregation array — it OOM'd the r12 sf10 sweep on a
    * 60M-row group, and would OOM any executor handed a hot group at
    * cluster scale. Here the sort is a range-partitioned SortExec
    * (spills to disk, spreads each group across partitions), the
    * needed ranks are computed from per-(partition, group) counts (a
    * broadcastable frame), only the ≤ 2·|ps| bracketing
    * rows per group survive the filter, and the interpolation repeats
    * Spark's own Percentile formula term-for-term —
    * `(ceil(pos)−pos)·v_lo + (pos−floor(pos))·v_hi` at
    * pos = (n−1)·p — so results are bit-identical to the builtin (and
    * to DuckDB's quantile_cont, which the builtin already hash-matched).
    * Nulls are excluded, as the builtin does — with one divergence: a
    * group whose values are ALL null is absent from the output (the
    * builtin keeps it with a null percentile). Callers joining the
    * result back must treat a missing group as "no non-null values".
    *
    * Returns one row per group: groupCols ++ outNames ++ n.
    */
  def exactPercentilesCont(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      ps: Seq[Double],
      outNames: Seq[String]
  ): DataFrame = {
    require(ps.nonEmpty && ps.length == outNames.length,
      s"ps (${ps.length}) and outNames (${outNames.length}) must align")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"percentiles $ps outside [0, 1]")
    val keys = groupCols.map(col)
    val rows = df.filter(col(valueCol).isNotNull)
      .select((keys :+ col(valueCol)): _*)
    // Per-group global rank, DISTRIBUTED: a plain per-group window sort
    // hands each group to ONE task (3-way parallelism on lineitem's
    // return flags, a dead stop on a hot group at 100 TB). Range-
    // partition on (group, value) instead — each group's sort spreads
    // across range partitions. A per-(partition, group) window would
    // then RE-shuffle the full data (its hash clustering satisfies
    // nothing the range exchange produced), so local ranks come
    // shuffle-free from the sorted-iterator id: after
    // sortWithinPartitions each group occupies a CONTIGUOUS
    // monotonically_increasing_id span, so local rank = id − the
    // group's first id in the partition, read off a
    // (#partitions × #groups)-row min/count frame built by one partial
    // aggregate. Global rank adds the broadcast cross-partition offset
    // — exactly the [[distributedRank]] construction per group, one
    // full-data exchange total. Ties split across a range boundary get
    // arbitrary rank ORDER, which is immaterial here: tied rows carry
    // the same value, and only the values at the bracketing ranks feed
    // the interpolation.
    val byRange = rows
      .repartitionByRange(rangeWidth(rows), (keys :+ col(valueCol)): _*)
      .sortWithinPartitions((keys :+ col(valueCol)): _*)
      .withColumn("__pc_pid", spark_partition_id())
      .withColumn("__pc_mid", monotonically_increasing_id())
    // The counts frame reads the SAME range shuffle (identical
    // exchange, runtime-reused) but skips the sort: a plain partial
    // aggregate needs no order. The group's first sorted-iterator id
    // is then derived, not aggregated — monotonically_increasing_id's
    // documented layout is (partitionId << 33) + recordIndex, and
    // within a sorted partition the groups are contiguous in key
    // order, so m0 = (pid << 33) + prefix-sum of the earlier groups'
    // counts. (RankOpsSpec's bit-identity test goes red if either
    // assumption ever breaks; partitions past 2^33 rows would too,
    // but a single 8.6-billion-row task is far past any sane split.)
    val partCounts = rows
      .repartitionByRange(rangeWidth(rows), (keys :+ col(valueCol)): _*)
      .withColumn("__pc_pid", spark_partition_id())
      .groupBy((col("__pc_pid") +: keys): _*)
      .agg(count(lit(1)).as("__pc_c"))
    // offsets over the (#partitions × #groups)-row counts frame — the
    // windows here run over partition COUNTS, not data
    val wIn = Window.partitionBy(col("__pc_pid")).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.partitionBy(keys: _*).orderBy(col("__pc_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(keys: _*)
    val offsets = partCounts
      .withColumn("__pc_m0",
        shiftleft(col("__pc_pid").cast("long"), 33) +
          coalesce(sum(col("__pc_c")).over(wIn), lit(0L)))
      .withColumn("__pc_off", coalesce(sum(col("__pc_c")).over(wOff), lit(0L)))
      .withColumn("__pc_n", sum(col("__pc_c")).over(wTot))
      .select((col("__pc_pid") +: keys :+ col("__pc_m0") :+
        col("__pc_off") :+ col("__pc_n")): _*)
    val ranked = byRange
      .join(broadcast(offsets), ("__pc_pid" +: groupCols))
      .withColumn("__pc_rn",
        col("__pc_off") + (col("__pc_mid") - col("__pc_m0")) + 1L)
    def pos(p: Double): Column = (col("__pc_n") - 1L).cast("double") * lit(p)
    val needed = ps.map { p =>
      (col("__pc_rn") === floor(pos(p)) + 1L) ||
        (col("__pc_rn") === ceil(pos(p)) + 1L)
    }.reduce(_ || _)
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        max(when(col("__pc_rn") === floor(pos(p)) + 1L, col(valueCol)))
          .as(s"__pc_lo_$i"),
        max(when(col("__pc_rn") === ceil(pos(p)) + 1L, col(valueCol)))
          .as(s"__pc_hi_$i"))
    } :+ max(col("__pc_n")).as("__pc_nn")
    val picked = ranked.filter(needed)
      .groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    val outs = ps.zipWithIndex.map { case (p, i) =>
      val po = (col("__pc_nn") - 1L).cast("double") * lit(p)
      when(floor(po) === ceil(po), col(s"__pc_lo_$i"))
        .otherwise(
          (ceil(po).cast("double") - po) * col(s"__pc_lo_$i") +
            (po - floor(po).cast("double")) * col(s"__pc_hi_$i"))
        .as(outNames(i))
    }
    picked.select((keys ++ outs :+ col("__pc_nn").as("n")): _*)
  }

  /** Exact grouped percentiles for BOUNDED-cardinality integer values
    * (latency days, delay buckets, retry counts): build the per-group
    * value histogram, cumulate over the DISTINCT values, and take the
    * nearest-rank cut `smallest v with 100·cum(v) ≥ p·n` — an integer
    * cross-multiply, no float rank, no per-group row sort. The shuffle
    * carries one row per (group, distinct value) — at 100 TB that is
    * groups × value-range, not the row count — which is why this beats
    * both a per-group window sort (skew: one task per hot group) and
    * approx_percentile (not exact) whenever the value domain is small.
    */
  def histogramPercentiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      percentiles: Seq[Int]
  ): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles $percentiles must be in [1, 100]")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty: an ungrouped call would plan a single-task " +
        "global window — aggregate to one synthetic group explicitly if global " +
        "percentiles over a BOUNDED value domain are really wanted")
    val gCols = groupCols.map(col)
    val h = df.filter(col(valueCol).isNotNull)
      .groupBy((gCols :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__n"))
    val wCum = Window.partitionBy(gCols: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(gCols: _*)
    val withCum = h
      .withColumn("__cum", sum(col("__n")).over(wCum))
      .withColumn("__tot", sum(col("__n")).over(wTot))
    val cuts = percentiles.map { p =>
      min(when(col("__cum") * 100 >= col("__tot") * p, col(valueCol)))
        .as(s"p${p}")
    }
    withCum.groupBy(gCols: _*)
      .agg(max(col("__tot")).as("n_values"), cuts: _*)
  }

  /** ABC / Pareto classification: keys ranked by value descending, the
    * running share decides the class — A while cumulative value is
    * inside `aPct`% of the total, B inside `bPct`%, C after. The
    * running total is the DISTRIBUTED prefix sum (range partition +
    * broadcast per-partition offsets — no single-task global window),
    * and both class cuts are integer cross-multiplies in decimal
    * (cum·100 ≤ total·pct) against a broadcast one-row grand total —
    * no float share ever computed, so the class boundary cannot
    * wobble between engines.
    */
  def abcClasses(
      perKey: DataFrame,
      keyCol: String,
      valueCol: String,
      aPct: Long = 80L,
      bPct: Long = 95L
  ): DataFrame = {
    require(aPct >= 1 && aPct < bPct && bPct < 100,
      s"need 1 <= aPct($aPct) < bPct($bPct) < 100")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val tot = broadcast(perKey.agg(sum(col(valueCol).cast(dec)).as("__tot")))
    val cum = distributedPrefixSum(
      perKey, Seq(col(valueCol).desc, col(keyCol).asc), valueCol, "cum_value")
    cum.crossJoin(tot)
      .select(col(keyCol), col(valueCol), col("cum_value"),
        when(col("cum_value").cast(dec) * 100 <= col("__tot") * aPct, "A")
          .when(col("cum_value").cast(dec) * 100 <= col("__tot") * bPct, "B")
          .otherwise("C").as("abc_class"))
  }
}
