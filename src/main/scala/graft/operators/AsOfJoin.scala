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
  ): DataFrame = {
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
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(col(tsCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSide.unionByName(rSide)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val withinTol = toleranceUs match {
      case Some(tol) =>
        matched.withColumn("__asof",
          when(col("__asof").isNotNull &&
            unix_micros(col(tsCol)) - unix_micros(col("__asof.__rts")) <= tol,
            col("__asof")))
      case None => matched
    }
    withinTol.select(
      keyCols ++
        Seq(col(tsCol)) ++
        leftPayload.map(c => col(s"__l.$c").as(c)) ++
        (col("__asof.__rts").as(s"${prefix}ts") +:
          rightPayload.map(c => col(s"__asof.$c").as(s"$prefix$c"))): _*)
  }
}
