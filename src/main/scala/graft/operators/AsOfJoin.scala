package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` per key (the canonical "price prevailing at
  * trade time" operator; Spark has no built-in for it).
  *
  * Implementation is the union-merge trick, not a range self-join:
  * tag both inputs, union them, and take `last(right_payload,
  * ignoreNulls) OVER (PARTITION BY keys ORDER BY ts, tag ROWS UNBOUNDED
  * PRECEDING)` — right rows sort before left rows at equal ts (tag 0 <
  * tag 1), making the match inclusive. Cost: ONE shuffle of |L|+|R|
  * rows and a single per-key ordered pass — versus the O(|L|x|R|)
  * blow-up of the naive `l.ts >= r.ts` range join, and no custom
  * SparkPlan needed (the composed plan stays AQE/codegen-friendly,
  * which is why this beats option (c) of the custom-operator ladder).
  * Optional tolerance bounds staleness like DuckDB/pandas `asof`.
  */
object AsOfJoin {

  /** @param leftPayload  left columns carried through (besides keys/ts)
    * @param rightPayload right columns emitted as the as-of match
    *                     (null when no right row precedes the left row,
    *                     or the match is older than `toleranceUs`)
    * @param prefix       prefix for right-payload output columns
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      leftPayload: Seq[String],
      rightPayload: Seq[String],
      prefix: String = "asof_",
      toleranceUs: Option[Long] = None
  ): DataFrame =
    directional(left, right, keys, tsCol, leftPayload, rightPayload,
      prefix, toleranceUs, forward = false)

  /** Forward as-of join — the EARLIEST right row with `right.ts >=
    * left.ts` per key (pandas `direction='forward'`): "the next quote
    * after the order". Same union-merge shape as [[asof]], scanned in
    * descending time so the running `last` carries the closest
    * following right row; equal timestamps still match (right sorts
    * before left either way).
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      leftPayload: Seq[String],
      rightPayload: Seq[String],
      prefix: String = "asof_",
      toleranceUs: Option[Long] = None
  ): DataFrame =
    directional(left, right, keys, tsCol, leftPayload, rightPayload,
      prefix, toleranceUs, forward = true)

  /** Nearest as-of join — whichever of the backward/forward matches is
    * closer in time, ties to the BACKWARD match (pandas
    * `direction='nearest'`). ONE union + ONE exchange: both running
    * matches are window columns over the same partitioning (two sort
    * orders, one shuffle), and the pick is a row-local integer
    * distance compare. `toleranceUs` bounds each side's distance
    * before the pick, exactly pandas' semantics.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      leftPayload: Seq[String],
      rightPayload: Seq[String],
      prefix: String = "asof_",
      toleranceUs: Option[Long] = None
  ): DataFrame = {
    val keyCols = keys.map(col)
    val (lSide, rSide) = tagged(left, right, keys, tsCol, leftPayload, rightPayload)
    val wB = Window.partitionBy(keyCols: _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCols: _*)
      .orderBy(col(tsCol).desc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val both = lSide.unionByName(rSide)
      .withColumn("__back", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__fwd", last(col("__r"), ignoreNulls = true).over(wF))
      .filter(col("__tag") === 1)
    val lts = unix_micros(col(tsCol))
    def dist(c: Column) = abs(lts - unix_micros(c.getField("__rts")))
    def ok(c: Column) = toleranceUs match {
      case Some(tol) => c.isNotNull && dist(c) <= tol
      case None => c.isNotNull
    }
    val picked = both.withColumn("__asof",
      when(ok(col("__back")) &&
        (!ok(col("__fwd")) || dist(col("__back")) <= dist(col("__fwd"))),
        col("__back"))
        .when(ok(col("__fwd")), col("__fwd")))
    finish(picked, keyCols, tsCol, leftPayload, rightPayload, prefix)
  }

  private def tagged(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      leftPayload: Seq[String],
      rightPayload: Seq[String]
  ): (DataFrame, DataFrame) = {
    val keyCols = keys.map(col)
    val rStruct = struct((col(tsCol).as("__rts") +: rightPayload.map(col)): _*)
    val lStruct = struct(leftPayload.map(col): _*)
    val rType = right.select(rStruct.as("__r")).schema("__r").dataType
    val lType = left.select(lStruct.as("__l")).schema("__l").dataType
    val lSide = left.select(
      keyCols ++ Seq(col(tsCol), lit(1).as("__tag"),
        lStruct.as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rSide = right.select(
      keyCols ++ Seq(col(tsCol), lit(0).as("__tag"),
        lit(null).cast(lType).as("__l"),
        rStruct.as("__r")): _*)
    (lSide, rSide)
  }

  private def finish(
      matched: DataFrame,
      keyCols: Seq[Column],
      tsCol: String,
      leftPayload: Seq[String],
      rightPayload: Seq[String],
      prefix: String
  ): DataFrame =
    matched.select(
      keyCols ++
        Seq(col(tsCol)) ++
        leftPayload.map(c => col(s"__l.$c").as(c)) ++
        (col("__asof.__rts").as(s"${prefix}ts") +:
          rightPayload.map(c => col(s"__asof.$c").as(s"$prefix$c"))): _*)

  private def directional(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      leftPayload: Seq[String],
      rightPayload: Seq[String],
      prefix: String,
      toleranceUs: Option[Long],
      forward: Boolean
  ): DataFrame = {
    val keyCols = keys.map(col)
    val (lSide, rSide) = tagged(left, right, keys, tsCol, leftPayload, rightPayload)
    val order = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(order, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSide.unionByName(rSide)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val signedGap =
      if (forward) unix_micros(col("__asof.__rts")) - unix_micros(col(tsCol))
      else unix_micros(col(tsCol)) - unix_micros(col("__asof.__rts"))
    val withinTol = toleranceUs match {
      case Some(tol) =>
        matched.withColumn("__asof",
          when(col("__asof").isNotNull && signedGap <= tol, col("__asof")))
      case None => matched
    }
    finish(withinTol, keyCols, tsCol, leftPayload, rightPayload, prefix)
  }
}
