package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.GraphOps

/** Streaming maintenance of the co-purchase edge store — the stream
  * twin of [[GraphOps.foldItemEdgeSupports]]: each micro-batch of
  * basket facts is reduced to its pair-support delta and folded into
  * the persisted support table. Pair supports are additive over
  * baskets, so the fold is associative and the store converges to the
  * batch derivation over everything ingested (EdgeStreamSpec asserts
  * stream ≡ batch across micro-batch slicings).
  *
  * Ordering contract: a basket's facts must arrive within ONE
  * micro-batch (what an order-completion feed delivers — a basket is
  *  published when it closes). A basket split across batches would
  * count its cross-batch pairs zero times, same as the fold's batch
  * form; route open baskets through a session-window assembler first
  * if the upstream emits item-at-a-time.
  *
  * Store shape: read-standing + full-outer + overwrite per batch —
  * the parquet rendering of a MERGE upsert. At warehouse scale the
  * standing side is a bucketed table ((x, y) buckets), the join is
  * co-located, and only the delta shuffles; the overwrite becomes a
  * partition-scoped MERGE. Exactly-once rides on the streaming
  * checkpoint: a replayed batch re-folds into the PRE-batch store
  * state only when the sink write itself failed mid-batch — the
  * two-generation layout below keeps the read and write generations
  * separate so a mid-write crash never corrupts the standing table.
  */
object EdgeStream {

  /** Fold the stream of (basket, item) facts into the support store at
    * `storePath`. The store alternates between two generation
    * directories (`gen=0`/`gen=1`): each batch reads the current
    * generation, writes the folded result to the other, then flips a
    * one-line manifest — a crash mid-write leaves the previous
    * generation intact.
    */
  def toSupportStore(
      facts: DataFrame,
      basketCol: String,
      itemCol: String,
      storePath: String,
      checkpoint: String
  ): DataStreamWriter[Row] =
    facts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        foldBatch(batch, basketCol, itemCol, storePath)
      }

  private def manifest(storePath: String) =
    java.nio.file.Paths.get(storePath, "CURRENT")

  private def currentGen(storePath: String): Int = {
    val m = manifest(storePath)
    if (java.nio.file.Files.exists(m))
      java.nio.file.Files.readString(m).trim.toInt
    else -1
  }

  /** The standing support table as currently committed (empty frame
    * with the right schema before the first fold).
    */
  def readStore(spark: org.apache.spark.sql.SparkSession, storePath: String): DataFrame = {
    val gen = currentGen(storePath)
    if (gen < 0)
      spark.range(0).select(
        col("id").as("x"), col("id").as("y"), col("id").as("support"))
    else spark.read.parquet(s"$storePath/gen=$gen")
  }

  private[graft] def foldBatch(
      batch: DataFrame,
      basketCol: String,
      itemCol: String,
      storePath: String
  ): Unit = {
    val spark = batch.sparkSession
    val standing = readStore(spark, storePath)
    val folded = GraphOps.foldItemEdgeSupports(standing, batch, basketCol, itemCol)
    val next = (currentGen(storePath) + 1) % 2
    folded.write.mode("overwrite").parquet(s"$storePath/gen=$next")
    java.nio.file.Files.createDirectories(manifest(storePath).getParent)
    java.nio.file.Files.writeString(manifest(storePath), next.toString)
  }

  /** Convenience: run the sink to completion over currently-available
    * input (test/backfill harness path).
    */
  def runAvailableNow(writer: DataStreamWriter[Row]): StreamingQuery = {
    val q = writer.start()
    q.awaitTermination()
    q
  }
}
