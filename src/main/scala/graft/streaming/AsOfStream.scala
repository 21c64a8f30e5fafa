package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of join — the realtime form of
  * [[graft.operators.AsOfJoin.asof]]: for each left event (trade), the
  * latest right event (quote) with `ts_r <= ts_l` on the same key,
  * optionally within a staleness tolerance; every left event is
  * emitted exactly once, with a null match when nothing prevails.
  *
  * Neither a windowed aggregate nor a stream-stream equi/interval join
  * can express "latest at-or-before, else null": the interval join
  * ([[StreamJoin]]) emits EVERY right row in the band and drops
  * matchless lefts. So this is `flatMapGroupsWithState` (the
  * [[CandleAssembler]] pattern): per-key buffers of pending lefts and
  * candidate rights, with event-time-timeout sealing.
  *
  * Correctness contract (stream ≡ batch, spec-asserted): a left at
  * `t` is sealed only once the watermark passes `t` — at that point no
  * right with `ts_r <= t` can still arrive (watermark guarantee), so
  * the match equals the batch join's. Equal timestamps match
  * (inclusive, like the batch union-merge tag ordering); ties between
  * multiple rights at the SAME ts resolve to the largest payload —
  * deterministic where the batch window form is partition-order-
  * dependent (keep right timestamps unique per key if you need the
  * two forms bit-identical under ties).
  *
  * State size: pending lefts are bounded by the watermark horizon ×
  * per-key event rate; rights are pruned to `ts_r >= watermark −
  * tolerance` plus the single newest at-or-before that line (the only
  * one a future left can still match when no tolerance is set) —
  * bounded, independent of stream length.
  */
object AsOfStream {

  /** Timestamp <-> epoch-micros without precision loss: `getTime` alone
    * truncates to milliseconds, which would corrupt microsecond event
    * times (every emitted ts would drift from its input).
    */
  private def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** One side's event: key, event time, payload value. */
  case class Tick(key: String, ts: Timestamp, value: Double)

  case class AsOfPair(
      key: String, ts_l: Timestamp, l_value: Double,
      asof_ts: Option[Timestamp], asof_value: Option[Double])

  /** Internal: union-tagged event (public for encoder codegen). */
  case class Tagged(key: String, ts: Timestamp, value: Double, left: Boolean)

  /** Internal: per-key pending buffers (public for encoder codegen). */
  case class BufState(
      lefts: List[(Long, Double)],
      rights: List[(Long, Double)])

  /** @param toleranceMs max staleness of the prevailing right row;
    *                    None = unbounded lookback (the newest
    *                    at-or-before right is retained in state
    *                    indefinitely, still O(1) per key)
    */
  def asofBackward(
      left: Dataset[Tick],
      right: Dataset[Tick],
      watermark: String,
      toleranceMs: Option[Long] = None
  ): Dataset[AsOfPair] = {
    implicit val tagEnc = Encoders.product[Tagged]
    implicit val keyEnc = Encoders.STRING
    implicit val stEnc = Encoders.product[BufState]
    implicit val outEnc = Encoders.product[AsOfPair]

    val tagged = left.map(t => Tagged(t.key, t.ts, t.value, left = true))
      .unionByName(right.map(t => Tagged(t.key, t.ts, t.value, left = false)))
      .withWatermark("ts", watermark)

    def matchFor(tsL: Long, rights: List[(Long, Double)]): Option[(Long, Double)] = {
      val eligible = rights.filter { case (tsR, _) =>
        tsR <= tsL && toleranceMs.forall(tol => tsR >= tsL - tol * 1000L)
      }
      // latest ts wins; equal-ts ties to the largest payload (total
      // order -> deterministic under any buffer order)
      if (eligible.isEmpty) None else Some(eligible.max)
    }

    def update(
        key: String,
        rows: Iterator[Tagged],
        state: GroupState[BufState]
    ): Iterator[AsOfPair] = {
      var s = state.getOption.getOrElse(BufState(Nil, Nil))
      if (!state.hasTimedOut) {
        rows.foreach { r =>
          if (r.left) s = s.copy(lefts = (toUs(r.ts), r.value) :: s.lefts)
          else s = s.copy(rights = (toUs(r.ts), r.value) :: s.rights)
        }
      }
      // buffers hold MICROS; the watermark API reports MILLIS. Seal
      // strictly below the watermark millisecond: a right inside the
      // same millisecond as the watermark is not yet guaranteed late.
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (ready, pending) = s.lefts.partition(_._1 < wmUs)
      val out = ready.sorted.map { case (tsL, v) =>
        val m = matchFor(tsL, s.rights)
        AsOfPair(key, fromUs(tsL), v,
          m.map(x => fromUs(x._1)), m.map(_._2))
      }
      // prune rights a future left (ts > wm) could never match: with a
      // tolerance, anything older than wm - tol; without one, keep the
      // single newest at-or-before wm plus everything after it
      val keptRights = toleranceMs match {
        case Some(tol) => s.rights.filter(_._1 >= wmUs - tol * 1000L)
        case None =>
          val (before, after) = s.rights.partition(_._1 < wmUs)
          if (before.isEmpty) after else before.max :: after
      }
      s = BufState(pending, keptRights)
      if (s.lefts.isEmpty && s.rights.isEmpty) state.remove()
      else {
        state.update(s)
        // wake when the earliest pending left seals; with only rights
        // left and a tolerance, wake when the last right expires so a
        // dead key's state is reclaimed (unbounded-lookback rights are
        // deliberately retained: they ARE the prevailing quote)
        val wakeUs: Option[Long] =
          if (pending.nonEmpty) Some(pending.map(_._1).min)
          else toleranceMs.flatMap(tol =>
            if (keptRights.isEmpty) None else Some(keptRights.map(_._1).max + tol * 1000L))
        wakeUs.foreach { w =>
          // timeout API is millis; round UP so the fire time is not
          // before the sealing micro-instant, and stay past the wm
          val wMs = Math.floorDiv(w, 1000L) + 1L
          state.setTimeoutTimestamp(math.max(wMs, state.getCurrentWatermarkMs() + 1L))
        }
      }
      out.iterator
    }

    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
