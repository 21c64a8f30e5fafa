package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Dev-only stage profiler for the corrScreen family (not part of the
  * engine): replicates each stage of
  * [[graft.operators.MicrostructureOps.corrScreen]] inline (the ops
  * are private) and times them at a given SF, so exact-stage design
  * changes are decided on measured stage walls, not guesses.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.CorrLab /tmp/sf1
  */
object CorrLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(new org.apache.spark.SparkConf().setAll(graft.sources.Tables.ReaderConfs))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CORRLAB $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val dec = DecimalType(38, 0)
    val keyCol = "user_id"; val bucketCol = "bucket_ts"
    val maxHamming = 24; val bucketCap = 10000L; val bandBits = 8

    val r1h = graft.operators.CandleOps.ohlcvRollup(
      graft.sources.Tables.events(spark, sfDir),
      Seq(keyCol), "ts", "value", "1 hour")

    // stage 1: moves (per-key lag window)
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val cl = round(col("close") * 100).cast(LongType)
    val d = cl - lag(cl, 1).over(wOrd)
    val moves = r1h.select(
      col(keyCol), unix_micros(col(bucketCol)).as("__us"), d.as("__d"))
      .filter(col("__d").isNotNull)
      .localCheckpoint() // isolate downstream stage timings
    time("moves")(println("  rows=" + moves.count()))

    // stage 2: sign fingerprints
    val axis = pmod(
      conv(substring(md5(col("__us").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast(LongType), lit(64L))
    val fp = moves.filter(col("__d") =!= 0)
      .select(col(keyCol), axis.as("__j"), col("__d").as("__s"))
      .groupBy(col(keyCol), col("__j"))
      .agg(sum(col("__s")).as("__vote"))
      .groupBy(col(keyCol))
      .agg(bit_or(
        when(col("__vote") > 0,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(__j AS INT))"))
          .otherwise(lit(0L))).as("__fp"))
      .localCheckpoint()
    time("fingerprints")(println("  keys=" + fp.count()))

    // stage 3: banded candidates
    val nBands = 64 / bandBits
    val bandMask = (1L << bandBits) - 1
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("__fp"), b * bandBits).bitwiseAND(lit(bandMask)).as("h"))
    }
    val banded = graft.functions.TextOps.capBuckets(
      fp.select(col(keyCol), col("__fp"),
          explode(array(bandStructs: _*)).as("__b"))
        .select(col(keyCol), col("__fp"),
          col("__b.band").as("band"), col("__b.h").as("h")),
      Seq("band", "h"), bucketCap)
    val a = banded.select(col(keyCol).as("key_a"), col("__fp").as("__fa"),
      col("band"), col("h"))
    val b = banded.select(col(keyCol).as("key_b"), col("__fp").as("__fb"),
      col("band"), col("h"))
    val rawCand = a.join(b, Seq("band", "h"))
      .filter(col("key_a") < col("key_b"))
    time("candidates-raw")(println("  rows=" + rawCand.count()))
    val pairs = rawCand
      .withColumn("hamming",
        bit_count(col("__fa").bitwiseXOR(col("__fb"))).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select(col("key_a"), col("key_b"), col("hamming"))
      .distinct()
      .localCheckpoint()
    time("pairs-distinct")(println("  rows=" + pairs.count()))

    // stage 4a: OLD exact stage — row-level double join
    def oldExact(): DataFrame = {
      val m1 = moves.select(col(keyCol).as("key_a"),
        col("__us"), col("__d").as("__da"))
      val m2 = moves.select(col(keyCol).as("__kb"),
        col("__us").as("__us2"), col("__d").as("__db"))
      val aligned = pairs
        .join(m1, Seq("key_a"))
        .join(m2, col("key_b") === col("__kb") && col("__us") === col("__us2"))
      val n = count(lit(1))
      val sa = sum(col("__da").cast(dec)).cast(LongType)
      val sb = sum(col("__db").cast(dec)).cast(LongType)
      val sab = sum((col("__da") * col("__db")).cast(dec)).cast(LongType)
      val saa = sum((col("__da") * col("__da")).cast(dec)).cast(LongType)
      val sbb = sum((col("__db") * col("__db")).cast(dec)).cast(LongType)
      aligned.groupBy(col("key_a"), col("key_b"))
        .agg(max(col("hamming")).as("hamming"), n.as("n_aligned"),
          when(n * saa - sa * sa > 0 && n * sbb - sb * sb > 0,
            (n * sab - sa * sb).cast(DoubleType) /
              sqrt((n * saa - sa * sa).cast(DoubleType) *
                (n * sbb - sb * sb).cast(DoubleType))).as("corr"))
    }
    time("exact-OLD-rowjoin")(println("  rows=" + oldExact().count()))
    time("exact-OLD-again")(oldExact().count())

    // stage 4b: NEW exact stage — broadcast packed arrays + codegen
    // two-pointer merge (the shipped broadcastSeries=true path)
    def newExact(): DataFrame = {
      val packed = moves
        .groupBy(col(keyCol).as("__k"))
        .agg(array_sort(collect_list(struct(col("__us"), col("__d"))))
          .as("__s"))
      val pa = broadcast(packed.select(col("__k").as("key_a"),
        col("__s").as("__pa")))
      val pb = broadcast(packed.select(col("__k").as("key_b"),
        col("__s").as("__pb")))
      pairs
        .join(pa, Seq("key_a"))
        .join(pb, Seq("key_b"))
        .withColumn("__c", graft.functions.AlignedCoMoments
          .alignedCoMoments(col("__pa"), col("__pb")))
        .filter(col("__c.n") > 0)
        .select(col("key_a"), col("key_b"), col("hamming"),
          col("__c.n").as("n_aligned"))
    }
    time("exact-NEW-bcast-codegen")(println("  rows=" + newExact().count()))
    time("exact-NEW-again")(newExact().count())

    // stage 4c: chunked fallback — the broadcastSeries=false 100 TB
    // guard: per-(key, week-chunk) packed series through SHUFFLE_HASH
    // joins, chunk co-moments re-aggregated per pair
    def chunkedExact(): DataFrame = {
      val chunkMicros = 7L * 24 * 3600 * 1000000L
      val packed = moves
        .groupBy(col(keyCol).as("__k"),
          floor(col("__us") / lit(chunkMicros.toDouble)).cast(LongType).as("__ck"))
        .agg(array_sort(collect_list(struct(col("__us"), col("__d")))).as("__s"))
        .hint("SHUFFLE_HASH")
      val pa = packed.select(col("__k").as("key_a"), col("__ck"), col("__s").as("__pa"))
      val pb = packed.select(col("__k").as("key_b"), col("__ck"), col("__s").as("__pb"))
      pairs
        .join(pa, Seq("key_a"))
        .join(pb, Seq("key_b", "__ck"))
        .select(col("key_a"), col("key_b"), col("hamming"),
          graft.functions.AlignedCoMoments
            .alignedCoMoments(col("__pa"), col("__pb")).as("__c"))
        .groupBy(col("key_a"), col("key_b"))
        .agg(max(col("hamming")).as("hamming"), sum(col("__c.n")).as("n"))
        .filter(col("n") > 0)
    }
    time("exact-CHUNKED-shufflehash")(println("  rows=" + chunkedExact().count()))
    time("exact-CHUNKED-again")(chunkedExact().count())

    // end-to-end: the real operator, uncheckpointed DAG
    val e2e = graft.operators.MicrostructureOps.corrScreen(
      r1h, keyCol, bucketCol, maxHamming = 24, bandBits = 8)
    time("corrScreen-e2e")(
      println("  rows=" + e2e.queryExecution.executedPlan.execute().count()))
    time("corrScreen-e2e-again")(e2e.count())
    val e2eChunked = graft.operators.MicrostructureOps.corrScreen(
      r1h, keyCol, bucketCol, maxHamming = 24, bandBits = 8,
      broadcastSeries = false)
    time("corrScreen-e2e-chunked")(println("  rows=" + e2eChunked.count()))
    time("corrScreen-e2e-chunked-again")(e2eChunked.count())
    val plan = e2e.queryExecution.executedPlan.toString
    println("  broadcastExchanges=" +
      "BroadcastExchange".r.findAllIn(plan).length +
      " reusedExchanges=" + "ReusedExchange".r.findAllIn(plan).length +
      " shuffles=" + "Exchange hashpartitioning".r.findAllIn(plan).length)
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/corr_e2e_plan.txt"),
      plan.getBytes("UTF-8"))

    spark.stop()
  }
}
