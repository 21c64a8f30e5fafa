package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.ShiftRight
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Count-min sketch over a key stream — mergeable point-frequency
  * estimation, the counting sibling of [[BloomOps]]'s membership
  * filter (HLL answers "how many distinct", the bloom answers "seen
  * at all", CMS answers "roughly how often").
  *
  * The sketch is a depth·width counter matrix: each key increments
  * one cell per depth row (cell chosen by Kirsch–Mitzenmacher double
  * hashing, like the bloom's probes), and a point estimate is the MIN
  * over the key's depth cells. Counters only ever increment, so the
  * estimate NEVER undercounts — `est >= true` is an invariant, not a
  * probability — and overshoot is bounded: each depth row's expected
  * excess is N/width (colliding keys' mass spread over the row), so
  * min-of-depth exceeds true + 3·depth·N/width with negligible
  * probability. Both facts are what the audit query publishes as
  * oracle-checked booleans.
  *
  * Build is the bloom's shape: one distributed explode→sum
  * aggregation to ≤ depth·width sparse cells, collected dense under
  * the same 16 MiB driver-state budget ([[MaxCells]], guard raises by
  * design — shard the key space). Estimation is a pure projection
  * against the cell array literal: zero shuffle, zero join. Unlike
  * the bloom's OR, the SUM fold is NOT replay-idempotent by algebra —
  * the streaming twin ([[graft.streaming.CmsStream]]) gets
  * exactly-once from per-batch partition overwrite instead (a replay
  * rewrites its own contribution, never double-counts).
  */
object CmsOps {
  private val Salt = 0x9E3779B97F4A7C15L

  /** Driver-state budget: 2^21 cells = 16 MiB of counters. */
  val MaxCells: Int = 1 << 21

  private def shr(v: Column, n: Column): Column =
    GraftBridge.column(
      ShiftRight(GraftBridge.expression(v), GraftBridge.expression(n)))

  // The same masked double-hash stream as BloomOps: with width a
  // power of two, (h1 + d·h2) mod width sees only the low bits, so
  // masking up front is bit-identical and ANSI-overflow-safe.
  private def h1Of(key: Column, width: Long): Column =
    xxhash64(key).bitwiseAND(lit(width - 1L))
  private def h2Of(key: Column, width: Long): Column =
    xxhash64(key, lit(Salt)).bitwiseAND(lit(width - 1L)).bitwiseOR(lit(1L))

  private def checkShape(width: Int, depth: Int): Unit = {
    require(width > 0 && (width & (width - 1)) == 0,
      s"width=$width must be a power of two")
    require(depth >= 1 && depth <= 8, s"depth=$depth outside [1, 8]")
    require(width.toLong * depth <= MaxCells,
      s"${graft.api.Guards.Marker}: a ${width}x$depth sketch needs " +
        s"${width.toLong * depth} cells > MaxCells=$MaxCells (16 MiB " +
        "driver-state budget) - shard the key space and sketch per shard")
  }

  /** The sketch as a RELATION — sparse (depth row, cell, count) rows
    * from one explode→sum aggregation. Counts from disjoint key
    * batches union and re-sum to the whole-stream sketch (mergeable);
    * a `weightCol` turns occurrence counting into weighted mass.
    */
  def cmsRows(
      df: DataFrame,
      keyCol: String,
      width: Int,
      depth: Int,
      weightCol: Option[String] = None
  ): DataFrame = {
    checkShape(width, depth)
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    df
      .select(h1Of(col(keyCol), width).as("__h1"),
        h2Of(col(keyCol), width).as("__h2"), w.as("__n"))
      .select(col("__h1"), col("__h2"), col("__n"),
        explode(sequence(lit(0L), lit((depth - 1).toLong))).as("__d"))
      .select(col("__d").cast(IntegerType).as("__d"),
        (col("__h1") + col("__d") * col("__h2"))
          .bitwiseAND(lit(width - 1L)).cast(IntegerType).as("__c"),
        col("__n"))
      .groupBy(col("__d"), col("__c"))
      .agg(sum(col("__n")).as("__count"))
  }

  /** Dense cell array (row-major depth×width) — bounded driver-held
    * model state under [[MaxCells]].
    */
  def cellsArray(rows: DataFrame, width: Int, depth: Int): Array[Long] = {
    checkShape(width, depth)
    val cells = new Array[Long](width * depth)
    rows.collect().foreach { r =>
      cells(r.getInt(0) * width + r.getInt(1)) = r.getLong(2)
    }
    cells
  }

  /** Build the dense sketch from the key stream in one pass. */
  def cmsCells(
      df: DataFrame,
      keyCol: String,
      width: Int,
      depth: Int,
      weightCol: Option[String] = None
  ): Array[Long] =
    cellsArray(cmsRows(df, keyCol, width, depth, weightCol), width, depth)

  /** Shard id for the sharded (cluster-resident) sketch path — a
    * third independent draw, uncorrelated with the in-shard cells.
    */
  private val ShardSalt = 0xC2B2AE3D27D4EB4FL
  def shardOf(key: Column, nShards: Int): Column =
    pmod(xxhash64(key, lit(ShardSalt)), lit(nShards.toLong)).cast(IntegerType)

  /** The SHARDED sketch as one relation — (shard, depth row, cell,
    * count): the past-[[MaxCells]] path, mirroring
    * [[BloomOps.bloomShardRows]]. Total size is bounded by cluster
    * storage, not the literal budget; estimates join instead of
    * probing a literal.
    */
  def cmsShardRows(
      df: DataFrame,
      keyCol: String,
      nShards: Int,
      width: Int,
      depth: Int,
      weightCol: Option[String] = None
  ): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be positive")
    checkShape(width, depth)
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    df
      .select(shardOf(col(keyCol), nShards).as("__shard"),
        h1Of(col(keyCol), width).as("__h1"),
        h2Of(col(keyCol), width).as("__h2"), w.as("__n"))
      .select(col("__shard"), col("__h1"), col("__h2"), col("__n"),
        explode(sequence(lit(0L), lit((depth - 1).toLong))).as("__d"))
      .select(col("__shard"), col("__d").cast(IntegerType).as("__d"),
        (col("__h1") + col("__d") * col("__h2"))
          .bitwiseAND(lit(width - 1L)).cast(IntegerType).as("__c"),
        col("__n"))
      .groupBy(col("__shard"), col("__d"), col("__c"))
      .agg(sum(col("__n")).as("__count"))
  }

  /** Keys + `est` against the SHARDED sketch relation: per distinct
    * key, depth probes join the cell rows on (shard, depth, cell) and
    * take the min — a probed absent cell counts 0 (nothing ever
    * incremented it). Nothing collects; probe volume is depth rows
    * per distinct key.
    */
  def estimateBatchSharded(
      df: DataFrame,
      keyCol: String,
      shardRows: DataFrame,
      nShards: Int,
      width: Int,
      depth: Int
  ): DataFrame = {
    checkShape(width, depth)
    val probes = df.select(col(keyCol)).distinct()
      .select(col(keyCol), shardOf(col(keyCol), nShards).as("__shard"),
        h1Of(col(keyCol), width).as("__h1"), h2Of(col(keyCol), width).as("__h2"))
      .select(col(keyCol), col("__shard"), col("__h1"), col("__h2"),
        explode(sequence(lit(0L), lit((depth - 1).toLong))).as("__d"))
      .select(col(keyCol), col("__shard"),
        col("__d").cast(IntegerType).as("__d"),
        (col("__h1") + col("__d") * col("__h2"))
          .bitwiseAND(lit(width - 1L)).cast(IntegerType).as("__c"))
    val verdict = probes
      .join(shardRows, Seq("__shard", "__d", "__c"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("__count"), lit(0L))).as("est"))
    df.join(verdict, Seq(keyCol), "left")
  }

  /** Point-estimate column: min over the key's depth cells — a pure
    * projection against ONE array literal (typedlit), zero shuffle.
    * Stage the hashes via [[estimateBatch]] when estimating many rows
    * (the inline form re-hashes per depth — the EMA-convolution
    * lesson).
    */
  def estimateFromHashes(
      h1: Column,
      h2: Column,
      cells: Array[Long],
      width: Int,
      depth: Int
  ): Column = {
    require(cells.length == width * depth,
      s"cells.length=${cells.length} != width*depth=${width * depth} — " +
        "the dense array must come from the same (width, depth) shape")
    val cl = typedlit(cells)
    (0 until depth).map { d =>
      element_at(cl,
        lit(d * width + 1) +
          (h1 + lit(d.toLong) * h2).bitwiseAND(lit(width - 1L))
            .cast(IntegerType))
    }.reduce(least(_, _))
  }

  /** Keys + `est` — the estimate per input row, projection-only. */
  def estimateBatch(
      df: DataFrame,
      keyCol: String,
      cells: Array[Long],
      width: Int,
      depth: Int
  ): DataFrame =
    df
      .withColumn("__h1", h1Of(col(keyCol), width))
      .withColumn("__h2", h2Of(col(keyCol), width))
      .withColumn("est",
        estimateFromHashes(col("__h1"), col("__h2"), cells, width, depth))
      .drop("__h1", "__h2")
}
