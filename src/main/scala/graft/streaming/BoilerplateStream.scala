package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.functions.TextOps

/** Streaming line-frequency store — the incremental form of
  * [[graft.functions.TextOps.boilerplateScrub]]'s template strip:
  * each micro-batch of documents folds its per-line distinct-doc
  * counts into a standing store, and a batch scrubs against the
  * frequencies of everything ingested in EARLIER batches (the
  * exclusive semantics of the substring/minhash/simhash incremental
  * trio).
  *
  * Count algebra: document ids are unique across an append-only
  * corpus (the ingest contract every incremental store here shares),
  * so each batch's per-line DISTINCT-doc count rows are disjoint
  * contributions and the read-side SUM is exactly the whole-corpus
  * distinct-doc count per line. Like [[CmsStream]], exactly-once is
  * the PARTITION contract, not algebra: sums would double-count on a
  * replay, so each batch's contribution lands as a dynamic overwrite
  * of its own `batch_seq=<key>-<id>` partition and a replay REPLACES
  * its prior rows. Store maintenance is batch-proportional (one
  * count row per distinct line hash in the batch — 16 bytes each,
  * never line text); the read fold is one sum re-aggregation.
  */
object BoilerplateStream {

  def toLineStore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      storePath: String,
      checkpoint: String
  ): DataStreamWriter[Row] = {
    val key = EdgeStream.streamKey(checkpoint)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, idCol, textCol, storePath, f"$key%s-$batchId%09d")
      }
  }

  private[graft] def foldBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      storePath: String,
      part: String
  ): Unit =
    TextOps.lineRows(batch, idCol, textCol)
      .select(col(idCol), col("__h"))
      .groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .withColumn("batch_seq", lit(part))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_seq")
      .parquet(storePath)

  /** The folded per-line distinct-doc counts (empty before the first
    * fold): one sum re-aggregation across per-batch contributions.
    * `except` (nullable) excludes a replaying batch's own partition —
    * the same self-exclusion view [[SubstringStream]] reads with.
    */
  def readLineCounts(
      spark: SparkSession,
      storePath: String,
      except: String = null
  ): DataFrame =
    if (!exists(storePath))
      spark.range(0).select(col("id").as("__h"), col("id").as("__nd"))
    else {
      val all = spark.read.parquet(storePath)
      val kept = if (except == null) all
        else all.filter(col("batch_seq") =!= except)
      kept.groupBy(col("__h")).agg(sum(col("__nd")).as("__nd"))
    }

  /** Line hashes whose standing distinct-doc count has reached
    * `minDocs` — the removal set a batch scrubs against.
    */
  def frequentHashes(
      spark: SparkSession,
      storePath: String,
      minDocs: Long,
      except: String = null
  ): DataFrame =
    readLineCounts(spark, storePath, except)
      .filter(col("__nd") >= minDocs)
      .select(col("__h"))

  /** Scrub a batch against the STANDING store (earlier batches only —
    * exclusive, like the substring trio): same output shape as the
    * batch operator ([[TextOps.boilerplateScrub]]). A caller
    * recovering a REPLAYED batch (crash between fold and scrub, or a
    * fold-then-scrub ordering) must pass its own `batch_seq` as
    * `except` so the batch's already-folded lines do not count toward
    * `minDocs` against themselves — the [[SubstringStream]]
    * self-exclusion contract.
    */
  def scrubBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      storePath: String,
      minDocs: Long,
      except: String = null
  ): DataFrame =
    TextOps.scrubAgainst(batch, idCol, textCol,
      frequentHashes(batch.sparkSession, storePath, minDocs, except))

  private def exists(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.getPath.getName.startsWith("batch_seq="))
  }
}
