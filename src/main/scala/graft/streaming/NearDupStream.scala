package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{MinHashSig, TextOps}

/** Streaming near-duplicate detection — the streaming analog of
  * `TextOps.minhashCrossPairs`: every arriving document checks itself
  * against the standing corpus WITHOUT re-pairing the corpus, because
  * the "standing corpus" is exactly the per-bucket LSH state.
  *
  * Shape: stateless MinHash signatures (one codegen'd projection) →
  * explode into band keys → `flatMapGroupsWithState` keyed on
  * (band, band-hash), whose state is the bounded list of doc ids seen
  * in that bucket. A new member emits one candidate pair per stored
  * member, then joins the state. The hot-bucket cap is a STATE BOUND
  * here: buckets at capacity stop accepting and stop emitting
  * (degenerate boilerplate buckets would otherwise grow state and
  * emit quadratically — the same guard the batch self-join applies,
  * enforced at ingest). Event-time timeout expires buckets idle past
  * the horizon, so state tracks the active working set, not history.
  *
  * Emitted pairs are per-band; the same pair colliding in two bands
  * appears twice — downstream consumers run the same
  * `dropDuplicatesWithinWatermark` they already use for content
  * hashes (chaining it inline here would put two stateful operators
  * in one query; supported, but left to the caller so the pair
  * stream stays composable).
  */
object NearDupStream {

  case class BandKey(band: Int, k0: Long, k1: Long)
  // carries the watermarked event-time column itself (not an epoch
  // projection of it): event-time timeout requires the watermark
  // column to survive into the flatMapGroupsWithState input
  private[streaming] case class BandRow(
      band: Int, k0: Long, k1: Long, doc_id: Long, t: Timestamp)
  private[streaming] case class BucketState(ids: List[Long], maxTsMs: Long)
  case class CandidatePair(doc_a: Long, doc_b: Long, ts: Timestamp)

  /** @param watermark      lateness bound on the doc event-time column
    * @param stateHorizonMs bucket state expires after this much event
    *                       time with no new members
    * @param bucketCap      max docs remembered per band bucket (the
    *                       hot-bucket guard as a state bound)
    */
  def candidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      watermark: String,
      bands: Int = 4,
      shingleSize: Int = 3,
      bucketCap: Int = 1000,
      stateHorizonMs: Long = 3600000L
  ): DataFrame = {
    require(bands > 0 && bucketCap > 0 && stateHorizonMs > 0,
      s"bands=$bands bucketCap=$bucketCap stateHorizonMs=$stateHorizonMs must be positive")
    val rowsPerBand = 2
    implicit val keyEnc = Encoders.product[BandKey]
    implicit val rowEnc = Encoders.product[BandRow]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[CandidatePair]

    val sig = docs
      .withWatermark(tsCol, watermark)
      .select(
        col(idCol).cast("long").as("doc_id"),
        col(tsCol).as("__ts"),
        MinHashSig.minhash_sig(
          TextOps.shingles(TextOps.tokens(col(textCol)), shingleSize),
          bands * rowsPerBand).as("sig"))
      .filter(col("sig").isNotNull)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        col("sig")(b * rowsPerBand).as("k0"),
        col("sig")(b * rowsPerBand + 1).as("k1"))
    }
    val banded = sig
      .select(col("doc_id"), col("__ts"), explode(array(bandStructs: _*)).as("__bh"))
      .select(col("__bh.band").as("band"), col("__bh.k0").as("k0"),
        col("__bh.k1").as("k1"), col("doc_id"),
        col("__ts").as("t"))
      .as[BandRow]

    def update(
        key: BandKey,
        rows: Iterator[BandRow],
        state: GroupState[BucketState]
    ): Iterator[CandidatePair] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var s = state.getOption.getOrElse(BucketState(Nil, Long.MinValue))
        val out = List.newBuilder[CandidatePair]
        rows.foreach { r =>
          if (!s.ids.contains(r.doc_id) && s.ids.size < bucketCap) {
            s.ids.foreach { old =>
              out += CandidatePair(
                math.min(old, r.doc_id), math.max(old, r.doc_id), r.t)
            }
            s = BucketState(r.doc_id :: s.ids, math.max(s.maxTsMs, r.t.getTime))
          }
        }
        state.update(s)
        state.setTimeoutTimestamp(s.maxTsMs + stateHorizonMs)
        out.result().iterator
      }
    }

    banded
      .groupByKey(r => BandKey(r.band, r.k0, r.k1))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
      .toDF()
  }
}
