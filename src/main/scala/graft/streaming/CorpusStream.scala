package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Streaming corpus ingest — the document-side analog of the candle
  * ingest path: as batches of raw documents arrive, gate on the cheap
  * quality signals, then drop exact-content duplicates statefully
  * within the watermark, all as ONE append-mode streaming query.
  *
  * Order matters for state size: the quality gates are stateless
  * projections and run FIRST, so rejected rows never enter the dedup
  * state store; the dedup key is a 16-byte content hash, never the
  * text, so per-key state is constant-size and the watermark bounds
  * how long each hash is remembered (reference behavior:
  * ReplacingMergeTree-style first-writer-wins on content identity,
  * applied at ingest instead of merge time).
  */
object CorpusStream {

  /** @param docs      streaming DataFrame of raw documents
    * @param tsCol     event-time column the watermark rides on
    * @param watermark e.g. "10 minutes" — how long a content hash is
    *                  remembered for dedup
    * @param minTokens  drop docs with fewer whitespace tokens
    * @param maxDupTokenRatio drop docs whose repeated-token share
    *                  exceeds this (1 - distinct/total, the cheap
    *                  repetition gate)
    * @return (idCol, tsCol, content_hash, n_tokens, textCol) of
    *         first-seen, gate-passing documents
    */
  def cleanIngest(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      watermark: String,
      minTokens: Int,
      maxDupTokenRatio: Double
  ): DataFrame = {
    require(minTokens >= 0, s"minTokens=$minTokens must be non-negative")
    require(maxDupTokenRatio >= 0.0 && maxDupTokenRatio <= 1.0,
      s"maxDupTokenRatio=$maxDupTokenRatio must be in [0, 1]")
    val toks = TextOps.tokens(col(textCol))
    val nTokens = size(toks).cast("long")
    val dupRatio = (nTokens - size(array_distinct(toks)).cast("long"))
      .cast("double") / nTokens.cast("double") // nTokens >= 1: split yields [""]
    docs
      .withColumn("n_tokens", nTokens)
      .filter(col("n_tokens") >= minTokens &&
        dupRatio <= maxDupTokenRatio)
      .withColumn("content_hash", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col(idCol), col(tsCol), col("content_hash"),
        col("n_tokens"), col(textCol))
  }

  /** Streaming CDC ingest: chunk each arriving document with
    * content-defined boundaries ([[TextOps.cdcChunks]] — a stateless
    * projection, so it runs ahead of any state store), then drop
    * chunks whose hash was already seen within the watermark. What
    * survives is the NOVEL content of the stream — a re-crawled page
    * contributes only the chunks its edit actually changed, at
    * 16-bytes-per-chunk state cost. Emits (doc_id, tsCol, chunk_idx,
    * chunk_hash, n_tokens, chunk_text).
    */
  def cdcIngest(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      watermark: String,
      w: Int,
      modulus: Int
  ): DataFrame = {
    TextOps.cdcChunks(docs, idCol, textCol, w, modulus, carry = Seq(tsCol))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("chunk_hash")
  }
}
