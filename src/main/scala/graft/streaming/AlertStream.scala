package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming half of S7 (reference: app/telegram_notifier.py wired into
  * the collector's error paths): a [[StreamingQueryListener]] that
  * turns query lifecycle failures into alert ROWS, joining the same
  * alert feed as the batch quality alerts ([[graft.operators.AlertOps]]).
  * Transport stays out of the engine — the feed is a DataFrame any
  * sink can deliver.
  */
object AlertStream {

  final case class StreamAlert(
      alert_type: String,
      severity: String,
      query_name: String,
      detail: String)

  /** Collects failure alerts from streaming query terminations. Names
    * are resolved from the start events (terminations only carry ids).
    */
  final class Listener extends StreamingQueryListener {
    private val names = mutable.Map.empty[java.util.UUID, String]
    private val buf = mutable.ArrayBuffer.empty[StreamAlert]

    override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit =
      synchronized { names(event.runId) = Option(event.name).getOrElse(event.id.toString) }

    override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = ()

    override def onQueryIdle(event: StreamingQueryListener.QueryIdleEvent): Unit = ()

    override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit =
      synchronized {
        val name = names.getOrElse(event.runId, event.id.toString)
        event.exception.foreach { msg =>
          buf += StreamAlert("stream_failed", "crit", name, msg.linesIterator.take(1).mkString)
        }
      }

    def alerts: Seq[StreamAlert] = synchronized(buf.toVector)

    def alertsDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      alerts.toDF()
    }
  }

  /** Attach a fresh collector to the session; caller removes it. */
  def attach(spark: SparkSession): Listener = {
    val l = new Listener
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: Listener): Unit =
    spark.streams.removeListener(l)
}
