package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, TimestampType}

/** `toStartOfInterval` as a single codegen'd Catalyst expression:
  * floor a timestamp to an arbitrary bucket width (epoch-aligned, like
  * Spark's tumbling `window()` and ClickHouse's `toStartOfInterval`,
  * reference: app/clickhouse_schema.py:82-91).
  *
  * Equivalent to `window(ts, d)("start")` for batch plans but without
  * the named_struct construction / projection the TimeWindow rewrite
  * introduces — one subtraction and one floorMod inside whole-stage
  * codegen. (Streaming aggregation keeps `window()`: watermark state
  * eviction is tied to the window expression.)
  */
case class TimeBucket(child: Expression, bucketUs: Long)
    extends UnaryExpression {

  require(bucketUs > 0, s"bucket width must be positive: $bucketUs")

  override def dataType: DataType = TimestampType

  override def nullSafeEval(input: Any): Any = {
    val us = input.asInstanceOf[Long]
    java.lang.Long.valueOf(us - java.lang.Math.floorMod(us, bucketUs))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"($c - java.lang.Math.floorMod($c, ${bucketUs}L))")

  override protected def withNewChildInternal(newChild: Expression): TimeBucket =
    copy(child = newChild)
}

object TimeBucket {

  /** Parse a Spark-style interval phrase ("15 minutes", "1 hour",
    * "90 seconds", "2 days") to microseconds. Fixed-width units only —
    * months/years are not fixed-width and have no epoch-aligned floor.
    */
  def intervalMicros(interval: String): Long = {
    val parts = interval.trim.toLowerCase.split("\\s+")
    require(parts.length == 2, s"expected '<n> <unit>': '$interval'")
    val n = parts(0).toLong
    val unitUs = parts(1).stripSuffix("s") match {
      case "second" => 1000000L
      case "minute" => 60L * 1000000L
      case "hour"   => 3600L * 1000000L
      case "day"    => 86400L * 1000000L
      case "week"   => 7L * 86400L * 1000000L
      case u => throw new IllegalArgumentException(s"unsupported bucket unit: $u")
    }
    n * unitUs
  }

  def time_bucket(ts: Column, interval: String): Column =
    GraftBridge.column(
      TimeBucket(GraftBridge.expression(ts), intervalMicros(interval)))
}
