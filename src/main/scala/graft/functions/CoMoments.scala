package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Aligned co-moment merge over two packed move series as a native
  * Catalyst expression — the row-local kernel of the corrScreen
  * family's exact stage ([[graft.operators.MicrostructureOps]]).
  *
  * `aligned_co_moments(a: array<struct<us:long, d:long>>,
  *                     b: array<struct<us:long, d:long>>)
  *   -> struct<n, sa, sb, sab, saa, sbb: long>`
  *
  * Both inputs MUST be sorted ascending by `us` (the packing
  * aggregates sort with `array_sort`); the kernel is a two-pointer
  * merge that accumulates, over buckets present in BOTH series,
  * the aligned count and the exact integer co-moments
  * Σd_a, Σd_b, Σd_a·d_b, Σd_a², Σd_b² — the same Long arithmetic as a
  * row-level join + sum aggregation, in a different association
  * order, so results are bit-identical (Long addition is exact and
  * commutative; overflow semantics match Spark's non-ANSI sum).
  *
  * A custom Expression (not a UDF): row-local, zero allocation per
  * element, and codegen emits a call to the kernel so the whole exact
  * stage (broadcast joins + this merge + the corr projection) stays
  * inside one WholeStageCodegen span with no shuffle at all.
  */
case class AlignedCoMoments(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = AlignedCoMoments.outType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AlignedCoMoments.merge(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.AlignedCoMoments$$.MODULE$$.merge($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AlignedCoMoments =
    copy(left = newLeft, right = newRight)
}

object AlignedCoMoments {

  val outType: StructType = StructType(
    Seq("n", "sa", "sb", "sab", "saa", "sbb")
      .map(StructField(_, LongType, nullable = false)))

  /** Two-pointer merge over us-sorted (us, d) series — called from
    * both the interpreted eval and the generated code.
    */
  def merge(a: ArrayData, b: ArrayData): InternalRow = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    var n = 0L; var sa = 0L; var sb = 0L
    var sab = 0L; var saa = 0L; var sbb = 0L
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2); val rb = b.getStruct(j, 2)
      val ua = ra.getLong(0); val ub = rb.getLong(0)
      if (ua < ub) i += 1
      else if (ub < ua) j += 1
      else {
        val da = ra.getLong(1); val db = rb.getLong(1)
        n += 1L; sa += da; sb += db
        sab += da * db; saa += da * da; sbb += db * db
        i += 1; j += 1
      }
    }
    new GenericInternalRow(Array[Any](n, sa, sb, sab, saa, sbb))
  }

  def alignedCoMoments(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(AlignedCoMoments(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** True iff the two sorted series share at least one `us` — the
    * cheap early-exit twin of [[AlignedCoMoments.merge]] (n > 0 ⟺
    * alignedAny). Exists so the exact stage can FILTER degenerate
    * pairs without referencing the full merge's result: a filter on
    * `merge(..).n > 0` gets predicate-pushed into the join condition
    * and Catalyst then evaluates the O(|series|) merge twice per row
    * (once in the condition, once in the projection); this predicate
    * is O(1) for any overlapping pair (first comparison usually
    * matches) and O(|series|) only for the disjoint pairs it drops.
    */
  def anyAligned(a: ArrayData, b: ArrayData): Boolean = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val ua = a.getStruct(i, 2).getLong(0)
      val ub = b.getStruct(j, 2).getLong(0)
      if (ua < ub) i += 1
      else if (ub < ua) j += 1
      else return true
    }
    false
  }

  def alignedAny(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(AlignedAny(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}

/** Boolean twin of [[AlignedCoMoments]]: do the two sorted series
  * share any aligned bucket? See [[AlignedCoMoments.anyAligned]].
  */
case class AlignedAny(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AlignedCoMoments.anyAligned(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.AlignedCoMoments$$.MODULE$$.anyAligned($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AlignedAny =
    copy(left = newLeft, right = newRight)
}
