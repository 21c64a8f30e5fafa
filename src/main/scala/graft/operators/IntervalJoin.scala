package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded interval-overlap join: all (left, right) pairs with the same
  * key whose half-open intervals [start, end) overlap — the temporal
  * sibling of [[RangeJoin]] (which joins points within a tolerance).
  *
  * A naive `l.start < r.end AND r.start < l.end` condition plans a
  * nested loop. Instead both sides explode their interval into the
  * fixed-width grid buckets it spans and equi-join on (key, bucket).
  * An overlapping pair shares every bucket their overlap spans, so the
  * pair is kept ONLY in the bucket containing max(l.start, r.start) —
  * that instant lies inside both intervals, so both sides exploded
  * into its bucket, and it is unique per pair: each qualifying pair
  * appears exactly once with NO distinct (zero dedup shuffle).
  *
  * Scale: fan-out per row is ceil(length / width) + O(1) — pick the
  * bucket width near the typical interval length so the explode is
  * O(1) per row; the join hash-partitions on (key, bucket) like any
  * equi-join, and AQE's skew split applies to hot buckets.
  */
object IntervalJoin {

  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      bucketWidthSeconds: Long,
      leftPayload: Seq[String],
      rightPayload: Seq[String]
  ): DataFrame = {
    require(bucketWidthSeconds > 0)
    val w = bucketWidthSeconds * 1000000L
    def bkt(c: Column): Column = floor(c / w)
    // half-open [start, end): the last covered instant is end - 1us
    def span(s: Column, e: Column): Column =
      sequence(bkt(unix_micros(s)), bkt(unix_micros(e) - 1))

    val l = left
      .filter(col(startCol) < col(endCol))
      .select(
        keys.map(col) ++
          Seq(col(startCol).as("start_l"), col(endCol).as("end_l")) ++
          leftPayload.map(c => col(c).as(s"l_$c")): _*)
      .withColumn("__b", explode(span(col("start_l"), col("end_l"))))
    val r = right
      .filter(col(startCol) < col(endCol))
      .select(
        keys.map(col) ++
          Seq(col(startCol).as("start_r"), col(endCol).as("end_r")) ++
          rightPayload.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("__b", explode(span(col("start_r"), col("end_r"))))

    val maxStart = greatest(unix_micros(col("start_l")), unix_micros(col("start_r")))
    l.join(r, keys :+ "__b")
      .filter(col("start_l") < col("end_r") && col("start_r") < col("end_l"))
      .filter(col("__b") === bkt(maxStart)) // report-once bucket
      .withColumn("overlap_us",
        least(unix_micros(col("end_l")), unix_micros(col("end_r"))) - maxStart)
      .drop("__b")
  }
}
