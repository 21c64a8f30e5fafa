package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.RollupStore

class KmeansCompactionSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans separates well-separated blobs and is deterministic") {
    val rng = new scala.util.Random(11)
    def blob(center: Array[Float], n: Int, from: Int) =
      (0 until n).map(i => ((from + i).toLong,
        center.map(c => c + rng.nextGaussian().toFloat * 0.05f)))
    val vecs = (blob(Array(10f, 0f, 0f), 30, 0) ++
      blob(Array(0f, 10f, 0f), 30, 30) ++
      blob(Array(0f, 0f, 10f), 30, 60)).toDF("vec_id", "embedding")

    val a1 = VectorOps.kmeansAssign(vecs, "vec_id", "embedding", k = 3, iterations = 5)
      .as[(Long, Int)].collect().toMap
    val a2 = VectorOps.kmeansAssign(vecs.repartition(7), "vec_id", "embedding", 3, 5)
      .as[(Long, Int)].collect().toMap
    assert(a1 == a2) // deterministic under repartitioning
    // each blob lands wholly in one cluster, blobs in distinct clusters
    val byBlob = Seq(0 until 30, 30 until 60, 60 until 90)
      .map(r => r.map(i => a1(i.toLong)).toSet)
    assert(byBlob.forall(_.size == 1))
    assert(byBlob.flatten.toSet.size == 3)
  }

  test("compaction shrinks file count, preserves data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val path = s"$dir/rollup"
    // simulate many micro-batch appends: 20 small writes
    val ts0 = Timestamp.valueOf("2024-03-01 00:00:00")
    (0 until 20).foreach { b =>
      Seq(("BTC", new Timestamp(ts0.getTime + b * 3600000L), 100.0 + b, "202403"))
        .toDF("symbol", "bucket_ts", "close", "bucket_month")
        .write.mode("append").partitionBy("bucket_month").parquet(path)
    }
    def files(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).count(_.getName.endsWith(".parquet"))
    }
    val before = files()
    assert(before >= 20)
    val beforeData = spark.read.parquet(path).orderBy("bucket_ts").collect()
    RollupStore.compactPartitions(spark, path, Seq("202403"))
    val after = files()
    assert(after < before / 2, s"$before -> $after")
    val afterData = spark.read.parquet(path).orderBy("bucket_ts").collect()
    assert(afterData.sameElements(beforeData))
  }

  test("kmeans handles large k and D (broadcast centroids, no plan blowup)") {
    // the previous formulation codegen'd k distance columns and D avg
    // columns per iteration — at k=64, D=128 it stopped compiling in
    // reasonable time; the broadcast/mapPartitions form must just run
    val dim = 128
    val vecs = (0L until 1000L)
      .map(i => (i, Array.tabulate(dim)(d => ((i * 31 + d * 7) % 97).toFloat)))
      .toDF("vec_id", "embedding")
    val t0 = System.nanoTime()
    val out = VectorOps.kmeansAssign(vecs, "vec_id", "embedding", k = 64, iterations = 3)
      .as[(Long, Int)].collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.length == 1000)
    assert(out.map(_._2).distinct.length <= 64)
    assert(out.forall(a => a._2 >= 0 && a._2 < 64))
    assert(secs < 60, s"large-k assignment took $secs s")
  }
}
