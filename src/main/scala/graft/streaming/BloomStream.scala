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

  private def exists(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.getPath.getName.startsWith("batch_seq="))
  }
}
