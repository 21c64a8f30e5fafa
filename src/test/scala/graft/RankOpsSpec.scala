package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.RankOps

/** The distributed exact ntile must agree with Spark's single-
  * partition window ntile on every row — including duplicate sort
  * values (broken by the id tiebreak), bucket counts that don't
  * divide evenly, and frames smaller than the bucket count.
  */
class RankOpsSpec extends SparkSpec {
  import spark.implicits._

  test("distributedNtile equals window ntile under ties and uneven buckets (3 seeds)") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed * 13 + 5)
      val n = 97 + rnd.nextInt(200) // never a multiple of 5 or 10
      val df = (1 to n).map(i => (i.toLong, rnd.nextInt(20).toLong))
        .toDF("id", "v").repartition(7)
      for (buckets <- Seq(5, 10)) {
        val order = Seq(col("v").desc, col("id").asc)
        val want = df.withColumn("nt",
          ntile(buckets).over(Window.orderBy(order: _*)))
          .select("id", "nt").as[(Long, Int)].collect().toMap
        val got = RankOps.distributedNtile(df, order, buckets, "nt")
          .select("id", "nt").as[(Long, Int)].collect().toMap
        assert(got == want, s"seed=$seed buckets=$buckets n=$n")
      }
    }
  }

  test("distributedRank equals window row_number (3 seeds)") {
    for (seed <- Seq(4, 5, 6)) {
      val rnd = new scala.util.Random(seed * 7 + 1)
      val df = (1 to 150).map(i => (i.toLong, rnd.nextInt(12).toLong))
        .toDF("id", "v").repartition(5)
      val order = Seq(col("v").desc, col("id").asc)
      val want = df.withColumn("r",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
        .select("id", "r").as[(Long, Long)].collect().toMap
      val got = RankOps.distributedRank(df, order, "r")
        .select("id", "r").as[(Long, Long)].collect().toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("frames smaller than the bucket count: one row per bucket from 1") {
    val tiny = Seq((1L, 9L), (2L, 7L), (3L, 8L)).toDF("id", "v")
    val got = RankOps.distributedNtile(tiny,
      Seq(col("v").desc, col("id").asc), 5, "nt")
      .select("id", "nt").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 3L -> 2, 2L -> 3))
  }

  test("weightedMedian: the median unit of weight, exact, vs a plain median") {
    // group g: values 1,2,100 with weights 1,1,10 -> total 12, half 6;
    // cumulative 1,2,12 -> first value reaching 6 is 100 (the plain
    // median would say 2). Zero/negative weights are dropped.
    val df = Seq(
      ("g", 1L, 1L, 1L), ("g", 2L, 1L, 2L), ("g", 100L, 10L, 3L),
      ("h", 5L, 3L, 4L), ("h", 7L, 3L, 5L), ("h", 9L, 0L, 6L)
    ).toDF("src", "v", "w", "id")
    val m = RankOps.weightedMedian(df, Seq("src"), "v", "w", "id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("g") == (100L, 12L), m.toString)
    // h: weights 3,3 (9 dropped) -> total 6, cum 3,6; 2*3 >= 6 -> 5
    assert(m("h") == (5L, 6L), m.toString)
  }

  test("distributedPrefixSum equals the one-partition running sum, any partitioning") {
    val rows = (1 to 500).map(i => ((i * 37) % 1000, (i % 7).toLong - 3L, i.toLong))
    val df = rows.toDF("k", "v", "id").repartition(13)
    val got = RankOps.distributedPrefixSum(
        df, Seq(col("k"), col("id")), "v", "run")
      .select("id", "run").as[(Long, Long)].collect().toMap
    val want = rows.sortBy(r => (r._1, r._3))
      .scanLeft((0L, 0L)) { case ((_, acc), (_, v, id)) => (id, acc + v) }
      .drop(1).toMap
    assert(got == want)
    // peak-sweep tie semantics (closed intervals): at a shared instant
    // starts (+1) order before ends (-1), so two intervals ending at
    // t=2 and one starting there are 3-concurrent; equal (ts, delta)
    // rows commute, so the max prefix is stable under physical order
    val sweep = Seq((1L, 1L), (1L, 1L), (2L, -1L), (2L, 1L)).toDF("ts", "d")
    val m = RankOps.distributedPrefixSum(
        sweep.repartition(5), Seq(col("ts"), col("d").desc), "d", "c")
      .agg(max(col("c"))).head().getLong(0)
    assert(m == 3L)
  }

  test("histogramPercentiles: nearest-rank cuts on a known ladder and vs brute force") {
    val ladder = (1L to 10L).map(v => ("g", v)).toDF("grp", "v")
    val got = RankOps.histogramPercentiles(ladder, Seq("grp"), "v", Seq(50, 90, 99))
      .select("n_values", "p50", "p90", "p99")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((10L, 5L, 9L, 10L)))
    // property: equals the sorted nearest-rank on random multisets
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 101 + 3)
      val rows = (1 to 200).map(_ =>
        (s"g${rnd.nextInt(3)}", rnd.nextInt(12).toLong))
      val got2 = RankOps.histogramPercentiles(
        rows.toDF("grp", "v").repartition(7), Seq("grp"), "v", Seq(50, 90, 99))
        .select("grp", "p50", "p90", "p99")
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = rows.groupBy(_._1).map { case (g, xs) =>
        val sorted = xs.map(_._2).sorted
        def cut(p: Int) = sorted((math.ceil(p * sorted.size / 100.0) - 1).toInt.max(0))
        g -> ((cut(50), cut(90), cut(99)))
      }
      assert(got2 == want, s"seed=$seed")
    }
  }

  test("exactPercentilesCont is bit-identical to the builtin percentile() aggregate") {
    // The spillable rank-selection form exists because the builtin
    // buffers whole groups in one in-memory array (OOM at a 60M-row
    // group); it must still reproduce the builtin's interpolation
    // EXACTLY — same doubles, not approximately — across ties, uneven
    // group sizes, integral positions (pos = (n-1)·p lands on a row),
    // nulls (excluded), and single-row groups.
    val ps = Seq(0.0, 0.25, 0.498, 0.5, 0.902, 1.0)
    val names = ps.indices.map(i => s"p$i")
    for (seed <- Seq(7, 8, 9)) {
      val rnd = new scala.util.Random(seed * 31 + 2)
      val rows = (1 to 400).map { i =>
        val g = s"g${rnd.nextInt(4)}"
        // heavy ties + an occasional null
        val v: java.lang.Double =
          if (rnd.nextInt(20) == 0) null
          else (rnd.nextInt(15) * 0.5 + (if (rnd.nextBoolean()) 0.25 else 0.0))
        (g, v, i.toLong)
      } :+ (("solo", java.lang.Double.valueOf(42.5), 0L))
      val df = rows.toDF("g", "v", "id").repartition(9)
      val want = df.groupBy(col("g"))
        .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("qs"))
        .select(col("g"), col("qs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val got = RankOps.exactPercentilesCont(df, Seq("g"), "v", ps, names)
      val gotMap = got.collect()
        .map(r => r.getString(0) -> names.map(n => r.getDouble(r.fieldIndex(n))))
        .toMap
      assert(gotMap.keySet == want.keySet, s"seed=$seed groups")
      for ((g, qs) <- want; (w, i) <- qs.zipWithIndex)
        assert(gotMap(g)(i) == w, // exact ==, not tolerance
          s"seed=$seed group=$g p=${ps(i)}: got ${gotMap(g)(i)} want $w")
    }
  }

  test("rank construction survives AQE partition coalescing on a skewed frame") {
    // The sorted-iterator-id construction shared by localRanks and
    // exactPercentilesCont reads the SAME range shuffle from two plan
    // branches (ranks + counts) and joins them on spark_partition_id —
    // it is only correct if AQE hands BOTH branches the same coalesced
    // partition layout. Force coalescing that merges SOME partitions
    // (advisory target sized between the skewed partitions and the
    // small tail ones, parallelismFirst off) over a heavily skewed
    // frame, so the range layout AQE hands downstream differs from the
    // shuffle's own; then assert the results still equal the
    // single-partition references.
    val confs = Seq(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val rnd = new scala.util.Random(41)
      // 90% of rows in one narrow value band, the rest spread wide
      val rows = (1 to 5000).map { i =>
        val v = if (rnd.nextInt(10) > 0) rnd.nextInt(3).toLong
                else 100L + rnd.nextInt(1000)
        (i.toLong, v, s"g${i % 3}")
      }
      val df = rows.toDF("id", "v", "g").repartition(11)
      val order = Seq(col("v").asc, col("id").asc)
      val wantRank = df.withColumn("r",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
        .select("id", "r").as[(Long, Long)].collect().toMap
      val gotRank = RankOps.distributedRank(df, order, "r")
        .select("id", "r").as[(Long, Long)].collect().toMap
      assert(gotRank == wantRank)
      val ps = Seq(0.1, 0.5, 0.9)
      val want = df.groupBy(col("g"))
        .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("qs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val got = RankOps.exactPercentilesCont(
        df, Seq("g"), "v", ps, Seq("a", "b", "c"))
        .collect()
        .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      assert(got == want, s"got $got want $want")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("abcClasses: exact cross-multiplied cuts, boundary values stay inside the class") {
    // shares 50/30/15/5: cum 50 (A), 80 (exactly the A cut -> A),
    // 95 (exactly the B cut -> B), 100 (C)
    val perKey = Seq(("w", 50L), ("x", 30L), ("y", 15L), ("z", 5L))
      .toDF("k", "value_cents").repartition(3)
    val got = RankOps.abcClasses(perKey, "k", "value_cents")
      .select("k", "cum_value", "abc_class")
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "w" -> ((50L, "A")), "x" -> ((80L, "A")),
      "y" -> ((95L, "B")), "z" -> ((100L, "C"))))
    // equal values: rank (and therefore cum) tie-breaks on the key
    val ties = Seq(("b", 10L), ("a", 10L)).toDF("k", "value_cents")
    val cums = RankOps.abcClasses(ties, "k", "value_cents")
      .select("k", "cum_value").as[(String, Long)].collect().toMap
    assert(cums == Map("a" -> 10L, "b" -> 20L))
  }
}
