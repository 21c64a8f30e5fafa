package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Dev-only round-15 experiment: bisect the corrMatrix pair-stage cost
  * — partition width × aggregation form (decimal / plain long /
  * ExactSum.splitSum) × guard join on/off — timed with the Bench
  * consume, min-of-2 per cell.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.CorrMatrixLab [sfDir]
  */
object CorrMatrixLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(new org.apache.spark.SparkConf().setAll(graft.sources.Tables.ReaderConfs))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def consume(df: org.apache.spark.sql.DataFrame): Unit = {
      val cols = df.schema.fieldNames.map(n => col("`" + n + "`"))
      df.select(xxhash64(cols.toIndexedSeq: _*).as("__h"))
        .agg(expr("bit_xor(__h)")).head()
      ()
    }
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"CORRMATRIXLAB $label ${ts.min}%.2f s (max ${ts.max}%.2f)")
    }

    val dec = DecimalType(38, 0)
    val keyCol = "user_id"; val bucketCol = "bucket_ts"
    val r1h = graft.operators.CandleOps.ohlcvRollup(
      graft.sources.Tables.events(spark, sfDir),
      Seq(keyCol), "ts", "value", "1 hour")

    def cts(c: String) = round(col(c) * 100).cast(LongType)

    def variant(parts: Int, agg: String, guard: Boolean): org.apache.spark.sql.DataFrame = {
      val g = r1h
        .agg(count_distinct(col(keyCol)).as("__universe"))
        .select(assert_true(col("__universe") <= 10000).as("__guard"))
      val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      val d = cts("close") - lag(cts("close"), 1).over(wOrd)
      val base = if (parts > 0) r1h.repartition(parts, col(keyCol)) else r1h
      val moves = base.select(
        col(keyCol), col(bucketCol).as("__b"), d.as("__d"))
        .filter(col("__d").isNotNull)
      val left0 = if (guard)
        moves.join(broadcast(g)).filter(col("__guard").isNull)
      else moves
      val left = left0.select(col(keyCol).as("key_a"), col("__b"), col("__d").as("__da"))
      val right = moves.select(
        col(keyCol).as("key_b"), col("__b").as("__b2"), col("__d").as("__db"))
      val joined = left.join(right,
        col("__b") === col("__b2") && col("key_a") < col("key_b"))
      val n = count(lit(1))
      agg match {
        case "count" =>
          joined.groupBy(col("key_a"), col("key_b")).agg(n.as("n_aligned"))
        case "long" =>
          joined.groupBy(col("key_a"), col("key_b"))
            .agg(n.as("n_aligned"),
              sum(col("__da") * col("__db")).as("sum_ab"),
              sum(col("__da") * col("__da")).as("sum_aa"),
              sum(col("__db") * col("__db")).as("sum_bb"))
        case "split" =>
          val E = graft.functions.ExactSum
          val sa = E.splitSum(col("__da")).cast(LongType)
          val sb = E.splitSum(col("__db")).cast(LongType)
          val sab = E.splitSum(col("__da") * col("__db")).cast(LongType)
          val saa = E.splitSum(col("__da") * col("__da")).cast(LongType)
          val sbb = E.splitSum(col("__db") * col("__db")).cast(LongType)
          joined.groupBy(col("key_a"), col("key_b"))
            .agg(n.as("n_aligned"),
              sab.as("sum_ab"), saa.as("sum_aa"), sbb.as("sum_bb"),
              when(n * saa - sa * sa > 0 && n * sbb - sb * sb > 0,
                (n * sab - sa * sb).cast(DoubleType) /
                  sqrt((n * saa - sa * sa).cast(DoubleType) *
                    (n * sbb - sb * sb).cast(DoubleType)))
                .as("corr"))
        case "dec" =>
          val sa = sum(col("__da").cast(dec)).cast(LongType)
          val sb = sum(col("__db").cast(dec)).cast(LongType)
          val sab = sum((col("__da") * col("__db")).cast(dec)).cast(LongType)
          val saa = sum((col("__da") * col("__da")).cast(dec)).cast(LongType)
          val sbb = sum((col("__db") * col("__db")).cast(dec)).cast(LongType)
          joined.groupBy(col("key_a"), col("key_b"))
            .agg(n.as("n_aligned"),
              sab.as("sum_ab"), saa.as("sum_aa"), sbb.as("sum_bb"),
              when(n * saa - sa * sa > 0 && n * sbb - sb * sb > 0,
                (n * sab - sa * sb).cast(DoubleType) /
                  sqrt((n * saa - sa * sa).cast(DoubleType) *
                    (n * sbb - sb * sb).cast(DoubleType)))
                .as("corr"))
      }
    }

    println("JOINED ROWS = " + variant(0, "count", guard = false)
      .agg(sum(col("n_aligned"))).head().getLong(0))
    // warm
    consume(variant(0, "dec", guard = true))
    for (p <- Seq(0, 2, 32); agg <- Seq("count", "long", "split", "dec"); g <- Seq(false, true))
      time(s"p=$p agg=$agg guard=$g")(consume(variant(p, agg, g)))
    spark.stop()
  }
}
