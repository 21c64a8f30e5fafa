package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the stateful analog of
  * `EventOps.funnelSteps`, emitting each user's FINAL funnel level
  * once the watermark proves the window can no longer change.
  *
  * The state buffers the user's step events (only steps, only while
  * they can still matter) and the greedy earliest-chain is computed
  * ONCE, at window close — so out-of-order arrival inside the
  * watermark cannot change a window's level (asserted in
  * FunnelStreamSpec by jittering arrival order across micro-batches).
  *
  * Episode semantics: after a window closes and emits, a LATER step-1
  * event (necessarily past the closed window's end — the watermark
  * already moved there) opens a fresh episode, anchored at the
  * earliest step-1 after the close. A long-lived stream therefore
  * emits one row per disjoint funnel episode per user; the FIRST
  * episode (minimum anchor_ts) is exactly the batch
  * `EventOps.funnelSteps` window, which anchors once at the user's
  * global earliest step-1 and ignores everything after its window.
  *
  * State bounds, per user: at most `maxBuffered` (step, ts) pairs;
  * events already outside the anchor's window are dropped on arrival
  * (the anchor only moves earlier, which only shrinks the window);
  * users who never produce a step-1 event are garbage-collected by
  * the same timeout without emitting — sound, because any step-1
  * event arriving after their GC carries a LATER timestamp than every
  * GC'd event, so the dropped events could never have followed it in
  * a chain.
  */
object FunnelStream {

  private[streaming] case class StepRow(user_id: Long, step: Int, t: Timestamp)
  private[streaming] case class FunnelState(
      steps: List[(Int, Long)], maxSeenMs: Long)
  case class FunnelResult(user_id: Long, level: Int, anchor_ts: Timestamp)

  /** @param windowUs    funnel window in microseconds from the anchor
    * @param watermark   lateness bound on `tsCol`
    * @param maxBuffered per-user cap on buffered step events
    */
  def funnelLevels(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowUs: Long,
      watermark: String,
      maxBuffered: Int = 1000
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowUs > 0 && maxBuffered > 0,
      s"windowUs=$windowUs maxBuffered=$maxBuffered must be positive")
    implicit val rowEnc = Encoders.product[StepRow]
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelResult]
    implicit val keyEnc = Encoders.scalaLong

    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(0)) { case (acc, (name, i)) =>
        when(col(typeCol) === name, lit(i + 1)).otherwise(acc)
      }
    val typed = events
      .withWatermark(tsCol, watermark)
      .select(
        col(userCol).cast("long").as("user_id"),
        stepIdx.as("step"),
        col(tsCol).as("t"))
      .filter(col("step") >= 1)
      .as[StepRow]

    def level(buf: List[(Int, Long)], k: Int): Option[(Int, Long)] = {
      val t1s = buf.collect { case (1, us) => us }
      if (t1s.isEmpty) None
      else {
        val anchor = t1s.min
        var prev = anchor
        var lvl = 1
        var continue = true
        for (i <- 2 to k if continue) {
          val cand = buf.collect {
            case (`i`, us) if us > prev && us <= anchor + windowUs => us
          }
          if (cand.isEmpty) continue = false
          else { prev = cand.min; lvl = i }
        }
        Some((lvl, anchor))
      }
    }

    def update(
        user: Long,
        rows: Iterator[StepRow],
        state: GroupState[FunnelState]
    ): Iterator[FunnelResult] = {
      if (state.hasTimedOut) {
        val s = state.getOption.getOrElse(FunnelState(Nil, Long.MinValue))
        state.remove()
        level(s.steps, steps.size).map { case (lvl, anchorUs) =>
          FunnelResult(user, lvl, new Timestamp(anchorUs / 1000))
        }.iterator
      } else {
        var s = state.getOption.getOrElse(FunnelState(Nil, Long.MinValue))
        rows.foreach { r =>
          // full microsecond precision: getTime floors to ms
          val us = r.t.getTime * 1000 + (r.t.getNanos / 1000) % 1000
          val anchor = s.steps.collect { case (1, a) => a }
            .minOption.getOrElse(Long.MaxValue)
          val keep =
            if (r.step == 1) us < anchor || us <= anchor + windowUs
            else us <= anchor + windowUs || anchor == Long.MaxValue
          if (keep && s.steps.size < maxBuffered)
            s = FunnelState((r.step, us) :: s.steps,
              math.max(s.maxSeenMs, r.t.getTime))
          else
            s = s.copy(maxSeenMs = math.max(s.maxSeenMs, r.t.getTime))
        }
        state.update(s)
        // close when the watermark passes anchor+window (no anchor yet:
        // horizon past the newest seen event GC's hopeless buffers)
        val anchorMs = s.steps.collect { case (1, a) => a }
          .minOption.map(_ / 1000)
        val closeMs = anchorMs
          .map(_ + windowUs / 1000 + 1)
          .getOrElse(s.maxSeenMs + windowUs / 1000 + 1)
        // a timeout at/behind the watermark throws; clamping forward
        // one ms fires it on the very next trigger instead
        state.setTimeoutTimestamp(
          math.max(closeMs, state.getCurrentWatermarkMs() + 1))
        Iterator.empty
      }
    }

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update _)
      .toDF()
  }
}
