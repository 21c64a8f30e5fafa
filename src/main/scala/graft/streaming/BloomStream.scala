package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.BloomOps

/** Streaming bloom-filter store — the stream twin of
  * [[graft.operators.BloomOps.bloomWords]]: each micro-batch of keys
  * folds its sparse (word index, or'd bits) contribution into a
  * standing store, and the read side bit_or's across batches into
  * exactly the filter the batch operator builds from the whole key
  * set at once.
  *
  * The OR algebra does the exactly-once work: bit_or is idempotent,
  * commutative, and associative, so the folded filter is independent
  * of batch boundaries, arrival order, AND replays — a re-delivered
  * batch re-ORs bits that are already set. The store still writes
  * each batch's contribution under its own `batch_seq=<key>-<id>`
  * partition (dynamic overwrite, the [[SubstringStream]] layout) so a
  * torn write never leaves a partial partition visible next to a
  * committed one, but unlike the edge store's generation fold or the
  * substring store's anti-join, correctness here needs NO manifest,
  * NO standing-store read in the fold, and NO exclusion view: the
  * fold is a pure function of the batch. Store maintenance is
  * batch-proportional (≤ min(k·|batch|, numWords) rows per batch);
  * the read-side fold is ≤ numWords·nBatches rows, both bounded by
  * the filter's [[BloomOps.MaxWords]] cap.
  */
object BloomStream {

  def toBloomStore(
      keys: DataFrame,
      keyCol: String,
      numWords: Int,
      k: Int,
      storePath: String,
      checkpoint: String
  ): DataStreamWriter[Row] = {
    val key = EdgeStream.streamKey(checkpoint)
    keys.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, keyCol, numWords, k, storePath,
          f"$key%s-$batchId%09d")
      }
  }

  private[graft] def foldBatch(
      batch: DataFrame,
      keyCol: String,
      numWords: Int,
      k: Int,
      storePath: String,
      part: String
  ): Unit =
    BloomOps.bloomWordRows(batch, keyCol, numWords, k)
      .withColumn("batch_seq", lit(part))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_seq")
      .parquet(storePath)

  /** The folded filter as sparse word rows (empty before the first
    * fold): one bit_or re-aggregation across the per-batch
    * contributions.
    */
  def readWordRows(spark: SparkSession, storePath: String): DataFrame =
    if (!exists(storePath))
      spark.range(0).select(col("id").cast("int").as("__w"),
        col("id").as("__bits"))
    else
      spark.read.parquet(storePath)
        .groupBy(col("__w")).agg(expr("bit_or(__bits)").as("__bits"))

  /** The folded filter dense — ready for
    * [[BloomOps.flagBatch]]/[[BloomOps.mightContainFromHashes]].
    */
  def readWords(
      spark: SparkSession, storePath: String, numWords: Int): Array[Long] =
    BloomOps.wordsArray(readWordRows(spark, storePath), numWords)

  private def exists(path: String): Boolean =
    partitions(path).nonEmpty

  private def partitions(path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch_seq="))
      .map(_.stripPrefix("batch_seq="))
  }

  // ---- sharded store: the 100 TB path --------------------------------
  //
  // The literal path above is bounded by [[BloomOps.MaxWords]] (16 MiB)
  // because readWords COLLECTS the folded filter to the driver and
  // flagBatch plants it in the plan as a literal — per-trigger cost
  // grows with the FILTER (store-proportional: measured 0.98 → 4.15 s
  // sf1 → sf10, STREAM_STORE_LATENCY_r14). The sharded path keeps the
  // filter cluster-resident as the (shard, word, bits) relation the
  // batch operator already ships (BloomOps.bloomShardRows /
  // q_bloom_sharded): the fold appends the batch's shard-row
  // contribution (batch-proportional), the probe JOINS the folded
  // relation (nothing collects, no plan literal), and nShards ·
  // wordsPerShard is bounded by cluster storage, not the driver.

  /** Streaming sink for the SHARDED bloom store: each micro-batch
    * appends its (shard, word, bits) contribution as its own
    * partition. Same OR-algebra exactly-once as the literal path —
    * replays re-OR set bits.
    */
  def toShardedStore(
      keys: DataFrame,
      keyCol: String,
      nShards: Int,
      wordsPerShard: Int,
      k: Int,
      storePath: String,
      checkpoint: String
  ): DataStreamWriter[Row] = {
    val key = EdgeStream.streamKey(checkpoint)
    keys.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatchSharded(batch, keyCol, nShards, wordsPerShard, k, storePath,
          f"$key%s-$batchId%09d")
      }
  }

  private[graft] def foldBatchSharded(
      batch: DataFrame,
      keyCol: String,
      nShards: Int,
      wordsPerShard: Int,
      k: Int,
      storePath: String,
      part: String
  ): Unit =
    BloomOps.bloomShardRows(batch, keyCol, nShards, wordsPerShard, k)
      .withColumn("batch_seq", lit(part))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_seq")
      .parquet(storePath)

  /** The folded sharded filter as a cluster-resident relation (empty
    * before the first fold): one bit_or re-aggregation across the
    * per-batch contributions — never collected, never a plan literal.
    */
  def readShardRows(spark: SparkSession, storePath: String): DataFrame =
    if (!exists(storePath))
      spark.range(0).select(col("id").cast("int").as("__shard"),
        col("id").cast("int").as("__w"), col("id").as("__bits"))
    else
      spark.read.parquet(storePath)
        .groupBy(col("__shard"), col("__w"))
        .agg(expr("bit_or(__bits)").as("__bits"))

  /** Probe a batch against the folded sharded store by JOIN — the
    * streaming read side of [[BloomOps.flagBatchSharded]]: probe
    * volume is k rows per distinct batch key, and the store side is a
    * columnar scan + bit_or fold of the word relation, bounded by the
    * filter's bit budget, not by the key count — no driver literal at
    * any store size.
    */
  def probeBatch(
      batch: DataFrame,
      keyCol: String,
      storePath: String,
      nShards: Int,
      wordsPerShard: Int,
      k: Int
  ): DataFrame =
    BloomOps.flagBatchSharded(batch, keyCol,
      readShardRows(batch.sparkSession, storePath),
      nShards, wordsPerShard, k)

  /** Compact the per-batch shard-row partitions into one folded
    * partition, bounding the read side's fold at (filter bits)/64
    * rows. Crash-safe purely by the OR algebra: the compacted
    * partition's bits are the OR of its inputs, so a crash between
    * the write and the sweep double-ORs — bit-identical. Repeated
    * compactions land on increasing `compact-N` names; the absorbed
    * partitions (everything listed BEFORE the write) are swept after.
    */
  def compact(spark: SparkSession, storePath: String): Unit = {
    val before = partitions(storePath)
    if (before.size <= 1) return
    val n = before.filter(_.startsWith("compact-"))
      .map(_.stripPrefix("compact-").toLong)
      .foldLeft(-1L)(math.max) + 1L
    // materialize the fold BEFORE writing into the same directory
    // (Spark refuses a write whose path is also being read); bounded
    // by the filter's (bits)/64 row budget, cluster-resident
    val folded = readShardRows(spark, storePath).localCheckpoint(true)
    folded
      .withColumn("batch_seq", lit(f"compact-$n%09d"))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_seq")
      .parquet(storePath)
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    before.foreach { part =>
      fs.delete(new org.apache.hadoop.fs.Path(p, s"batch_seq=$part"), true)
    }
  }
}
