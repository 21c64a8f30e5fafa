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
  * the parquet rendering of a MERGE upsert. Each generation is a
  * BUCKETED table on (x, y) (one file per bucket, sorted), so the
  * fold's full-outer join reads the standing side in place — zero
  * exchange and zero sort on the (arbitrarily large) standing table,
  * only the micro-batch's delta shuffles. This is what keeps per-batch
  * fold cost bounded by the DELTA at warehouse scale; at a plain
  * parquet layout the entire standing table would reshuffle every
  * micro-batch. Generations are registered as external catalog tables
  * by deterministic name, re-created on demand so a FRESH session
  * recovering from the manifest regains the bucket metadata.
  *
  * Exactly-once: the manifest records (generation, last-applied
  * batchId, stream key) and is flipped by an ATOMIC_MOVE; [[foldBatch]]
  * is a no-op when the incoming (streamKey, batchId) was already
  * applied. The two crash windows are therefore both safe: a crash
  * BEFORE the manifest flip leaves the previous generation current and
  * the replayed batch re-folds from the pre-batch state; a crash AFTER
  * the flip but before the streaming checkpoint commits makes the
  * replay hit the already-applied (streamKey, batchId) and skip — no
  * double-count in either order.
  *
  * The stream key (a digest of the checkpoint path) scopes the batchId
  * comparison to ONE batch sequence: batchIds restart at 0 whenever a
  * checkpoint is replaced, so a bare `batchId == lastApplied` guard
  * would silently DROP a fresh query's batch 0 against a store whose
  * manifest happens to record 0 (and conversely could double-fold a
  * replay it failed to recognize). With the key: same key + same id →
  * replay, skip; same key + higher id → progress, fold; different key
  * + id 0 → a deliberately new sequence over an existing store, fold
  * and adopt; anything else (same key + LOWER id, or an unknown
  * sequence arriving mid-stream) is a store/checkpoint pairing error
  * and fails fast rather than guessing.
  */
object EdgeStream {
  /** Once-per-store dedup for the keyless-fold degradation warning —
    * a long-running legacy stream hits the condition on EVERY
    * micro-batch and would otherwise flood the logs.
    */
  private val warnedKeyless =
    new scala.collection.concurrent.TrieMap[String, Unit]()

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
  ): DataStreamWriter[Row] = {
    val key = streamKey(checkpoint)
    facts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, basketCol, itemCol, storePath, batchId, key)
      }
  }

  /** Batch-sequence identity: a digest of the checkpoint path. The
    * checkpoint IS the sequence — batchIds are only comparable within
    * one checkpoint's lifetime, and a restart of the same query reuses
    * the same checkpoint (so replay detection survives restarts), while
    * a replaced checkpoint yields a new key (so its restarted batch 0
    * is recognized as new work, not a replay).
    */
  private[graft] def streamKey(checkpoint: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
    d.take(8).map(b => f"$b%02x").mkString
  }

  private def manifest(storePath: String) =
    java.nio.file.Paths.get(storePath, "CURRENT")

  /** Manifest = "(gen, lastAppliedBatchId, streamKey)"; (-1, -1, null)
    * before the first fold. Tolerates the legacy one- and two-field
    * forms (gen only / no stream key): a legacy manifest keeps the
    * legacy skip semantics until the next fold upgrades it.
    */
  private def readManifest(storePath: String): (Int, Long, String) = {
    val m = manifest(storePath)
    if (!java.nio.file.Files.exists(m)) (-1, -1L, null)
    else java.nio.file.Files.readString(m).trim.split("\\s+") match {
      case Array(g)       => (g.toInt, -1L, null)
      case Array(g, b)    => (g.toInt, b.toLong, null)
      case Array(g, b, k) => (g.toInt, b.toLong, if (k == "-") null else k)
      case other => throw new IllegalStateException(
        s"corrupt edge-store manifest at $m: '${other.mkString(" ")}'")
    }
  }

  /** Flip the manifest via unique temp-file + ATOMIC_MOVE: readers see
    * either the old committed (gen, batchId, key) or the new one, never
    * a torn write (a truncated CURRENT would otherwise poison every
    * later read of the store). The temp name is unique per writer
    * (createTempFile), so even two misconfigured concurrent folds
    * against one storePath cannot interleave on a shared temp file —
    * last flip wins whole, never torn.
    */
  private def writeManifest(
      storePath: String, gen: Int, batchId: Long, key: String): Unit = {
    val m = manifest(storePath)
    java.nio.file.Files.createDirectories(m.getParent)
    val tmp = java.nio.file.Files.createTempFile(m.getParent, "CURRENT", ".tmp")
    java.nio.file.Files.writeString(tmp, s"$gen $batchId $key")
    java.nio.file.Files.move(tmp, m,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private val NumBuckets = 32

  /** Deterministic per-(store, generation) catalog table name. */
  private def genTable(storePath: String, gen: Int): String =
    s"graft_edge_stream_${Integer.toHexString(storePath.hashCode).replace('-', 'n')}_g$gen"

  /** Ensure the generation's bucketed catalog entry exists (a fresh
    * session recovering from the manifest has the files but not the
    * catalog row; re-creating the EXTERNAL table restores the bucket
    * metadata without touching the files).
    */
  private def ensureRegistered(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String,
      gen: Int
  ): String = {
    val t = genTable(storePath, gen)
    if (!spark.catalog.tableExists(t))
      spark.sql(
        s"""CREATE TABLE $t (x BIGINT, y BIGINT, support BIGINT)
           |USING parquet OPTIONS (path '$storePath/gen=$gen')
           |CLUSTERED BY (x, y) SORTED BY (x, y) INTO $NumBuckets BUCKETS""".stripMargin)
    t
  }

  /** The standing support table as currently committed (empty frame
    * with the store's schema before the first fold). Store schema is
    * fixed at (x long, y long, support long): [[GraphOps
    * .itemEdgeSupports]] canonicalizes every item id to long, so the
    * long-id contract is the whole edge chain's, enforced at
    * [[foldBatch]].
    */
  def readStore(spark: org.apache.spark.sql.SparkSession, storePath: String): DataFrame = {
    val (gen, _, _) = readManifest(storePath)
    if (gen < 0)
      spark.range(0).select(
        col("id").as("x"), col("id").as("y"), col("id").as("support"))
    else spark.table(ensureRegistered(spark, storePath, gen))
  }

  private[graft] def foldBatch(
      batch: DataFrame,
      basketCol: String,
      itemCol: String,
      storePath: String,
      batchId: Long,
      streamKey: String = null
  ): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val itemType = batch.schema(itemCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType).contains(itemType),
      s"EdgeStream: item column '$itemCol' is $itemType; the edge store " +
        "requires integral (long-castable) item ids — GraphOps." +
        "itemEdgeSupports canonicalizes endpoints to long, and a non-" +
        "integral id would fail the fold's join mid-stream. Map string " +
        "ids through a dictionary (e.g. hash or a dimension join) first.")
    val spark = batch.sparkSession
    val (gen, lastApplied, recordedKey) = readManifest(storePath)
    // degraded-detection warning: without a stream key, "same sequence"
    // is assumed and replay detection is the bare batchId comparison —
    // exactly the silent-drop class the keyed manifest exists to kill
    if (streamKey == null && lastApplied >= 0 &&
        warnedKeyless.putIfAbsent(storePath, ()).isEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"EdgeStream: fold against $storePath without a streamKey — replay " +
          "detection degrades to the bare batchId comparison (a fresh " +
          "sequence's batch whose id equals the recorded one is silently " +
          "skipped). Pass EdgeStream.streamKey(checkpoint) to make skips " +
          "sequence-scoped.")
    val sameSeq = recordedKey == null || streamKey == null ||
      recordedKey == streamKey
    if (sameSeq) {
      // replayed batch of the recorded sequence: already folded
      if (batchId >= 0 && batchId == lastApplied) {
        // first KEYED fold against a keyless (legacy) manifest landing
        // on the skip path: adopt-and-rewrite the manifest with the key
        // so this store leaves the degraded bare-batchId semantics NOW
        // — a later batch of a different sequence must fail fast, not
        // silently fold. (Whether THIS skip was right is legacy-
        // ambiguous; recording the key is what stops the next one.)
        if (recordedKey == null && streamKey != null && gen >= 0) {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"EdgeStream: adopting legacy keyless manifest at $storePath " +
              s"for stream $streamKey on the skip path (batch $batchId == " +
              "recorded); if this batch belonged to a NEW sequence, the " +
              "legacy semantics dropped it — verify the store against the " +
              "source if the checkpoint was replaced")
          writeManifest(storePath, gen, lastApplied, streamKey)
        }
        return
      }
      // Spark only ever replays the LAST uncommitted batch; a LOWER id
      // from the same sequence means the checkpoint and store were
      // paired with different histories — refuse rather than guess
      if (batchId >= 0 && lastApplied >= 0 && batchId < lastApplied)
        throw new IllegalStateException(
          s"EdgeStream: batch $batchId arrived for store $storePath whose " +
            s"manifest already records batch $lastApplied of the same " +
            s"stream — the checkpoint does not match this store's history")
    } else if (batchId > 0) {
      // an unknown batch sequence arriving MID-stream: its earlier
      // batches were never folded here — fail fast (a fresh sequence
      // legitimately adopting an existing store starts at batch 0)
      throw new IllegalStateException(
        s"EdgeStream: batch $batchId of unrecognized stream $streamKey " +
          s"arrived for store $storePath (manifest records stream " +
          s"$recordedKey at batch $lastApplied) — replace the store or " +
          s"start the new query from batch 0 (fresh checkpoint)")
    }
    val standing = readStore(spark, storePath)
    val folded = GraphOps.foldItemEdgeSupports(standing, batch, basketCol, itemCol)
      .select(col("x").cast(LongType), col("y").cast(LongType),
        col("support").cast(LongType))
    val next = (gen + 1 + 2) % 2
    // overwrite the WRITE generation's bucketed table (saveAsTable
    // drops + re-creates the external entry at the same path); the
    // committed generation's files are never touched, so a crash
    // mid-write still leaves the previous generation intact
    graft.sources.BucketedStore.writeBucketedAt(
      folded, genTable(storePath, next), s"$storePath/gen=$next",
      bucketCols = Seq("x", "y"), numBuckets = NumBuckets,
      sortCols = Seq("x", "y"))
    writeManifest(storePath, next, batchId,
      if (streamKey == null) "-" else streamKey)
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
