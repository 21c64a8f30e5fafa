package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: pairs of events from two live streams
  * with the same key within a time tolerance — the streaming form of
  * the batch banded range join (graft.operators.RangeJoin).
  *
  * Both sides carry watermarks and the join condition bounds event-time
  * distance, so Spark can expire join state: each side retains only
  * rows inside (watermark - tolerance). Without the time bounds the
  * state would grow forever — the interval predicate is what makes a
  * stream-stream join feasible at all.
  */
object StreamJoin {

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      toleranceSeconds: Long,
      watermark: String,
      leftPayload: Seq[String],
      rightPayload: Seq[String]
  ): DataFrame = {
    val l = left
      .select(keys.map(col) ++ Seq(col(tsCol).as("ts_l")) ++
        leftPayload.map(c => col(c).as(s"l_$c")): _*)
      .withWatermark("ts_l", watermark)
    val r = right
      .select(keys.map(k => col(k).as(s"r_key_$k")) ++ Seq(col(tsCol).as("ts_r")) ++
        rightPayload.map(c => col(c).as(s"r_$c")): _*)
      .withWatermark("ts_r", watermark)
    val keyCond = keys.map(k => col(k) === col(s"r_key_$k")).reduce(_ && _)
    val timeCond =
      col("ts_r") >= col("ts_l") - expr(s"INTERVAL $toleranceSeconds SECONDS") &&
        col("ts_r") <= col("ts_l") + expr(s"INTERVAL $toleranceSeconds SECONDS")
    l.join(r, keyCond && timeCond)
      .drop(keys.map(k => s"r_key_$k"): _*)
  }
}
