package graft

import org.apache.spark.sql.functions._

import graft.functions.{LayoutOps, ZValue}

/** Z-order interleave correctness and the locality property the
  * layout exists for: z-clustered partitions cover compact rectangles
  * in both dimensions at once.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave puts left bits at even positions, right at odd") {
    assert(ZValue.interleave(0L, 0L) == 0L)
    assert(ZValue.interleave(3L, 0L) == 5L)   // 0b11 -> 0b101
    assert(ZValue.interleave(0L, 3L) == 10L)  // 0b11 -> 0b1010
    assert(ZValue.interleave(3L, 3L) == 15L)
    assert(ZValue.interleave(4L, 1L) == 18L)  // 0b100 even + 0b1 odd = 0b10010
    // full 31-bit inputs stay non-negative
    val full = ZValue.interleave(0x7FFFFFFFL, 0x7FFFFFFFL)
    assert(full == 0x3FFFFFFFFFFFFFFFL && full > 0)
    // bits above 31 are masked, not smeared
    assert(ZValue.interleave(0x100000000L, 0L) == 0L)
  }

  test("z_value column: codegen path matches the kernel; nulls propagate") {
    val df = Seq((Some(5L), Some(9L)), (None, Some(1L)))
      .toDF("a", "b")
      .select(ZValue.z_value(col("a"), col("b")).as("z"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == ZValue.interleave(5L, 9L))
    assert(rows(1).isNullAt(0))
  }

  test("zorderCluster: partitions are compact in BOTH dimensions") {
    // 64x64 grid; clustered into 16 range partitions each partition
    // should cover ~a 16x16 block, not a 64-wide stripe
    val grid = (for { a <- 0 until 64; b <- 0 until 64 } yield (a.toLong, b.toLong))
      .toDF("a", "b").repartition(7) // scrambled input layout
    val clustered = LayoutOps.zorderCluster(grid, col("a"), col("b"), 16)
    val spans = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("a") - min("a")).as("spanA"), (max("b") - min("b")).as("spanB"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.map(_.getAs[Long]("n")).sum == 64L * 64L)
    val avgA = spans.map(_.getAs[Long]("spanA")).sum.toDouble / spans.length
    val avgB = spans.map(_.getAs[Long]("spanB")).sum.toDouble / spans.length
    // a single-dimension sort would leave the other dim's span at 63;
    // z-order keeps both far below half the global span
    assert(avgA <= 32.0, s"avg span over a: $avgA")
    assert(avgB <= 32.0, s"avg span over b: $avgB")
  }
}
