package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.functions.TextOps

/** Streaming exact-substring dedup against a standing shingle-hash
  * store — the stream twin of
  * [[graft.functions.TextOps.substringCrossSpans]] (the r11 substring
  * family's incremental form), completing the incremental-ingest trio
  * alongside the minhash and simhash cross folds.
  *
  * Per micro-batch of documents, two outputs land:
  *   - SPANS: the batch's maximal token spans whose every k-token
  *     window already occurs in the standing corpus (everything
  *     ingested in EARLIER batches — same exclusive semantics as the
  *     batch operator, where the new batch is not part of the
  *     corpus), appended under the batch's own partition of
  *     `spansPath`;
  *   - STORE: the batch's distinct shingle hashes NOT yet in the
  *     store, appended under the batch's own partition of
  *     `storePath`.
  *
  * Store shape — APPEND-ONLY, batch-proportional: because the state
  * is a distinct-hash SET, the fold appends only the hashes absent
  * from the standing store (per-batch partitions are DISJOINT by
  * construction, so the store's union is the distinct set and no
  * generation rewrite ever happens). That is strictly cheaper than
  * the edge store's read+full-outer+overwrite generations
  * ([[EdgeStream]]): set union needs no re-aggregation, so store
  * maintenance is proportional to the batch, never the corpus.
  *
  * Exactly-once WITHOUT a manifest: both writes are dynamic
  * partition overwrites of the batch's own `batch_seq=<key>-<id>`
  * partition (the [[StreamingRollup.toParquetSink]] contract). A
  * replayed batch recomputes against a standing view that EXCLUDES
  * its own partition (else a replay would see its own hashes and
  * flag every span), then overwrites exactly its own two partitions
  * — bit-identical, idempotent, no torn state in either crash
  * window. The `key` scopes partitions to one checkpoint's batch
  * sequence, so a replaced checkpoint restarts cleanly next to an
  * existing store.
  *
  * Scale shape: the standing store is scanned ONCE per batch with no
  * shuffle — the batch's distinct hashes (bounded: a micro-batch) are
  * broadcast into the scan to find which are `present`, and the
  * (still smaller) present set broadcasts back into the batch's
  * shingle positions for the span merge. Nothing corpus-sized ever
  * shuffles; shuffle rows are the batch's 24-byte (hash, doc, pos)
  * triples, never text. Batches whose distinct-hash count exceeds
  * `maxBroadcastHashes` fall back to a shuffle join (correct, just
  * not broadcast).
  */
object SubstringStream {

  /** Distinct shingle hashes a broadcast comfortably holds (8 B + key
    * overhead each; 5M ≈ 120 MB build). Above this the per-batch
    * joins degrade to shuffles instead of risking the driver.
    */
  val DefaultMaxBroadcastHashes = 5000000L

  def toShingleStore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      storePath: String,
      spansPath: String,
      checkpoint: String,
      maxBroadcastHashes: Long = DefaultMaxBroadcastHashes
  ): DataStreamWriter[Row] = {
    val key = EdgeStream.streamKey(checkpoint)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, idCol, textCol, k, storePath, spansPath,
          batchId, key, maxBroadcastHashes)
      }
  }

  /** The standing distinct-hash set as currently committed (one `__h`
    * column; empty before the first fold).
    */
  def readStoreHashes(spark: SparkSession, storePath: String): DataFrame =
    readStoreExcept(spark, storePath, except = null)

  /** All landed spans: (doc_id, span_start, span_end, n_tokens,
    * batch_seq).
    */
  def readSpans(spark: SparkSession, spansPath: String): DataFrame = {
    require(exists(spansPath), s"no spans landed at $spansPath")
    spark.read.parquet(spansPath)
  }

  private def exists(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.getPath.getName.startsWith("batch_seq="))
  }

  private def readStoreExcept(
      spark: SparkSession, storePath: String, except: String): DataFrame =
    if (!exists(storePath))
      spark.range(0).select(col("id").as("__h"))
    else {
      val all = spark.read.parquet(storePath)
      // partition pruning drops the excluded (replaying) batch's dir
      val kept = if (except == null) all
        else all.filter(col("batch_seq") =!= except)
      kept.select(col("__h"))
    }

  private[graft] def foldBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      storePath: String,
      spansPath: String,
      batchId: Long,
      key: String,
      maxBroadcastHashes: Long = DefaultMaxBroadcastHashes
  ): Unit = {
    val spark = batch.sparkSession
    val part = f"$key%s-$batchId%09d"
    val standing = readStoreExcept(spark, storePath, except = part)
    // one pass of the batch's shingles feeds both outputs
    val shp = TextOps.shinglePositions(batch, idCol, textCol, k)
      .localCheckpoint(true)
    val batchHashes = shp.select(col("__h")).distinct().localCheckpoint(true)
    val small = batchHashes.count() <= maxBroadcastHashes
    def maybeBroadcast(df: DataFrame) = if (small) broadcast(df) else df
    // which batch hashes the standing corpus already holds: the store
    // scans in place, the (bounded) batch set broadcasts into it
    val present = standing
      .join(maybeBroadcast(batchHashes), Seq("__h"))
      .distinct()
      .localCheckpoint(true)
    val spans = TextOps.mergeSpans(
      shp.join(maybeBroadcast(present), Seq("__h"), "left_semi")
        .select(col("doc_id"), col("pos")), k)
    writePartition(spans, spansPath, part)
    val fresh = batchHashes.join(maybeBroadcast(present), Seq("__h"), "left_anti")
    writePartition(fresh, storePath, part)
  }

  private def writePartition(df: DataFrame, path: String, part: String): Unit =
    df.withColumn("batch_seq", lit(part))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_seq")
      .parquet(path)
}
