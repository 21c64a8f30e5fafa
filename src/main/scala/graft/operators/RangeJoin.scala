package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded time-range join: all (left, right) pairs with the same key
  * and |right.ts - left.ts| <= tolerance.
  *
  * A naive `a.ts BETWEEN b.ts - tol AND b.ts + tol` join condition
  * forces a broadcast-nested-loop (quadratic) plan. Instead, bucket
  * both sides to tolerance-width bands and equi-join on (key, band)
  * with each left row duplicated into its two adjacent bands — every
  * qualifying pair shares at least one band, the equi-join hash-
  * partitions like any other join, and the residual |dt| filter runs
  * post-join. Cost: 3x the left rows shuffled instead of |L|x|R|
  * compared pairs.
  */
object RangeJoin {

  def timeProximityJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      toleranceSeconds: Long,
      leftPayload: Seq[String],
      rightPayload: Seq[String]
  ): DataFrame = {
    require(toleranceSeconds > 0)
    val bandUs = toleranceSeconds * 1000000L
    def band(c: Column): Column = floor(unix_micros(c) / bandUs)

    val l = left.select(
      keys.map(col) ++ Seq(col(tsCol).as("ts_l")) ++
        leftPayload.map(c => col(c).as(s"l_$c")): _*)
      .withColumn("__band", explode(array(
        band(col("ts_l")) - 1, band(col("ts_l")), band(col("ts_l")) + 1)))
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol).as("ts_r")) ++
        rightPayload.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("__band", band(col("ts_r")))

    l.join(r, keys :+ "__band")
      .filter(abs(unix_micros(col("ts_r")) - unix_micros(col("ts_l"))) <= bandUs)
      .drop("__band")
  }
}
