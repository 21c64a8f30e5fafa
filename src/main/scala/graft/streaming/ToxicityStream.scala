package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming VPIN: the volume-clock toxicity monitor of
  * [[graft.operators.MicrostructureOps.vpin]] as a stateful stream —
  * per symbol, one tiny clock struct (last close, cumulative volume,
  * the open bucket's running sums), and a volume bucket is emitted
  * EXACTLY when a later bar's cumulative volume lands in a higher
  * bucket — the earliest moment the bucket is provably complete. The
  * still-open bucket is never emitted (batch reports it; the stream
  * twin's contract is "closed buckets only", spec-asserted equal to
  * the batch report minus each key's final partial bucket).
  *
  * Ordering contract: bars must arrive per-key in bucket_ts order
  * across micro-batches (what [[CandleAssembler]] produces — candles
  * seal in watermark order); within a micro-batch rows are sorted
  * before folding, so intra-batch shuffling cannot corrupt the clock.
  *
  * State: ONE struct per symbol, independent of bar volume — bounded
  * by the symbol universe, no timeout needed.
  */
object ToxicityStream {

  case class Bar(symbol: String, bucket_ts: Timestamp,
      closeCents: Long, volumeCents: Long)

  case class ClockState(
      hasLast: Boolean, lastClose: Long, cumVol: Long,
      bucketId: Long, signedSum: Long, totalVol: Long, nBars: Long)

  case class ClosedBucket(
      symbol: String, vol_bucket: Long, n_bars: Long,
      imbalance_cents: Long, total_cents: Long, toxicity_bps: Double)

  def toxicity(
      bars: Dataset[Bar],
      bucketVolumeCents: Long
  ): Dataset[ClosedBucket] = {
    require(bucketVolumeCents > 0,
      s"bucketVolumeCents=$bucketVolumeCents must be positive")
    implicit val stateEnc = Encoders.product[ClockState]
    implicit val outEnc = Encoders.product[ClosedBucket]
    implicit val strEnc = Encoders.STRING

    def closed(sym: String, s: ClockState): ClosedBucket = {
      val imb = math.abs(s.signedSum)
      ClosedBucket(sym, s.bucketId, s.nBars, imb, s.totalVol,
        imb.toDouble * 10000 / s.totalVol.toDouble)
    }

    def update(
        sym: String,
        rows: Iterator[Bar],
        state: GroupState[ClockState]
    ): Iterator[ClosedBucket] = {
      var s = state.getOption.getOrElse(
        ClockState(hasLast = false, 0L, 0L, 0L, 0L, 0L, 0L))
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedBucket]
      rows.toSeq.sortBy(_.bucket_ts.getTime).foreach { bar =>
        if (!s.hasLast) {
          // first bar of the key: no tick sign — off the clock,
          // exactly the batch operator's isNotNull(d) exclusion
          s = s.copy(hasLast = true, lastClose = bar.closeCents)
        } else {
          val d = bar.closeCents - s.lastClose
          if (bar.volumeCents > 0) {
            val sv = java.lang.Long.signum(d) * bar.volumeCents
            val newCum = s.cumVol + bar.volumeCents
            val bId = (newCum - 1) / bucketVolumeCents
            if (bId != s.bucketId && s.nBars > 0) {
              out += closed(sym, s)
              s = s.copy(signedSum = 0L, totalVol = 0L, nBars = 0L)
            }
            s = s.copy(cumVol = newCum, bucketId = bId,
              signedSum = s.signedSum + sv,
              totalVol = s.totalVol + bar.volumeCents,
              nBars = s.nBars + 1)
          }
          s = s.copy(lastClose = bar.closeCents)
        }
      }
      state.update(s)
      out.iterator
    }

    bars
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
