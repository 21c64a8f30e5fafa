package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two dimension keys — the
  * multi-dimensional clustering primitive: rows sorted by z-value are
  * simultaneously clustered on BOTH dimensions, so per-file min/max
  * statistics prune scans for predicates on either one (the layout
  * trick behind Delta/Iceberg OPTIMIZE ZORDER, built here from a
  * single codegen'd expression plus repartitionByRange).
  *
  * Bit j of each input lands at z bits 2j (left) and 2j+1 (right);
  * inputs are masked to their low 31 bits so the result stays a
  * non-negative long. Callers normalize dimensions to compact
  * non-negative ranges first (bucket ids, day numbers, dictionary
  * codes) — interleaving raw sparse ids wastes prefix bits.
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(
      ZValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZValue.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

object ZValue {

  /** Spread the low 31 bits of x to the even bit positions 0,2,..,60. */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** z = a's bits at even positions, b's at odd. Referenced by
    * generated code — keep public and static-shaped.
    */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  def z_value(a: Column, b: Column): Column =
    GraftBridge.column(ZValue(
      GraftBridge.expression(a.cast("long")),
      GraftBridge.expression(b.cast("long"))))
}

/** Write-side layout operators built on [[ZValue]]. */
object LayoutOps {

  /** Cluster a frame for two-dimensional scan pruning: range-partition
    * and sort by the z-value of (dimA, dimB). Each output partition
    * (= file, at write time) then covers a compact z-range, which is a
    * compact rectangle-union in (dimA, dimB) space — min/max file
    * stats prune on either dimension. One range exchange, same cost
    * class as any global sort; do it once at write time.
    */
  def zorderCluster(
      df: DataFrame,
      dimA: Column,
      dimB: Column,
      numPartitions: Int
  ): DataFrame = {
    require(numPartitions > 0, s"numPartitions=$numPartitions must be positive")
    df.withColumn("__z", ZValue.z_value(dimA, dimB))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
