package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the stateful analog of
  * `EventOps.funnelSteps`, emitting each user's FINAL funnel level
  * once the watermark proves the window can no longer change.
  *
  * The state buffers the user's step events and the greedy
  * earliest-chain is computed ONCE, at window close — so out-of-order
  * arrival inside the watermark cannot change a window's level
  * (asserted in FunnelStreamSpec by jittering arrival order across
  * micro-batches).
  *
  * Episode semantics: when a window closes and emits, buffered events
  * past the window's end are RETAINED and seed the next episode,
  * anchored at the earliest step-1 among them — so episode boundaries
  * depend only on event times, never on how arrivals were batched.
  * A long-lived stream emits one row per disjoint funnel episode per
  * user; the FIRST episode (minimum anchor_ts) is exactly the batch
  * `EventOps.funnelSteps` window, which anchors once at the user's
  * global earliest step-1 and ignores everything after its window.
  *
  * State bounds, per user: at most `maxBuffered` (step, ts) pairs —
  * each close discards the closed window's events, so the buffer
  * tracks the in-flight horizon (watermark + window), not history.
  * Users who never produce a step-1 event are garbage-collected by
  * the same timeout without emitting — sound, because any step-1
  * event arriving after their GC carries a LATER timestamp than every
  * GC'd event, so the dropped events could never have followed it in
  * a chain.
  *
  * Keys are carried as strings (any id type works unchanged); `steps`
  * must be distinct event types, because the streaming form maps each
  * event to exactly one step index (the batch form has no such
  * constraint).
  *
  * Liveness note (Spark semantics, verified empirically on 4.1.2):
  * event-time timeouts are processed only in micro-batches whose
  * stateful operator receives at least one row, so a window whose
  * close the watermark has passed emits with the NEXT arriving step
  * event, not instantly. A live stream always has step traffic; a
  * drained test stream must flush with a step event (see
  * FunnelStreamSpec), not with filtered-out noise.
  */
object FunnelStream {

  private[streaming] case class StepRow(user_id: String, step: Int, t: Timestamp)
  private[streaming] case class FunnelState(
      steps: List[(Int, Long)], maxSeenMs: Long)
  case class FunnelResult(user_id: String, level: Int, anchor_ts: Timestamp)

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
    require(steps.distinct.size == steps.size,
      s"streaming funnel steps must be distinct event types: $steps")
    require(windowUs > 0 && maxBuffered > 0,
      s"windowUs=$windowUs maxBuffered=$maxBuffered must be positive")
    implicit val rowEnc = Encoders.product[StepRow]
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelResult]
    implicit val keyEnc = Encoders.STRING

    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(0)) { case (acc, (name, i)) =>
        when(col(typeCol) === name, lit(i + 1)).otherwise(acc)
      }
    val typed = events
      .withWatermark(tsCol, watermark)
      .select(
        col(userCol).cast("string").as("user_id"),
        stepIdx.as("step"),
        col(tsCol).as("t"))
      .filter(col("step") >= 1 && col("user_id").isNotNull)
      .as[StepRow]

    def level(buf: List[(Int, Long)]): Option[(Int, Long)] = {
      val t1s = buf.collect { case (1, us) => us }
      if (t1s.isEmpty) None
      else {
        val anchor = t1s.min
        var prev = anchor
        var lvl = 1
        var continue = true
        for (i <- 2 to steps.size if continue) {
          val cand = buf.collect {
            case (`i`, us) if us > prev && us <= anchor + windowUs => us
          }
          if (cand.isEmpty) continue = false
          else { prev = cand.min; lvl = i }
        }
        Some((lvl, anchor))
      }
    }

    // (re-)arm the close timer: anchor+window when an anchor exists,
    // else a GC horizon past the newest seen event. A timeout at or
    // behind the watermark throws; clamping forward one ms fires it on
    // the very next trigger instead.
    def arm(state: GroupState[FunnelState], s: FunnelState): Unit = {
      val anchorMs = s.steps.collect { case (1, a) => a }
        .minOption.map(_ / 1000)
      val closeMs = anchorMs
        .map(_ + windowUs / 1000 + 1)
        .getOrElse(s.maxSeenMs + windowUs / 1000 + 1)
      state.setTimeoutTimestamp(
        math.max(closeMs, state.getCurrentWatermarkMs() + 1))
    }

    def update(
        user: String,
        rows: Iterator[StepRow],
        state: GroupState[FunnelState]
    ): Iterator[FunnelResult] = {
      if (state.hasTimedOut) {
        val s = state.getOption.getOrElse(FunnelState(Nil, Long.MinValue))
        level(s.steps) match {
          case None =>
            state.remove() // no anchor: GC (soundness argued above)
            Iterator.empty
          case Some((lvl, anchorUs)) =>
            // events past this window seed the NEXT episode
            val leftover = s.steps.filter(_._2 > anchorUs + windowUs)
            if (leftover.isEmpty) state.remove()
            else {
              val next = FunnelState(leftover, s.maxSeenMs)
              state.update(next)
              arm(state, next)
            }
            Iterator.single(
              FunnelResult(user, lvl, new Timestamp(anchorUs / 1000)))
        }
      } else {
        var s = state.getOption.getOrElse(FunnelState(Nil, Long.MinValue))
        rows.foreach { r =>
          // full microsecond precision: getTime floors to ms
          val us = r.t.getTime * 1000 + (r.t.getNanos / 1000) % 1000
          // buffer every step event (cap-bounded): an event past the
          // current window belongs to a later episode, and an event
          // before the current anchor may matter if an even earlier
          // anchor arrives late
          if (s.steps.size < maxBuffered)
            s = FunnelState((r.step, us) :: s.steps,
              math.max(s.maxSeenMs, r.t.getTime))
          else
            s = s.copy(maxSeenMs = math.max(s.maxSeenMs, r.t.getTime))
        }
        state.update(s)
        arm(state, s)
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
