package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: stage-by-stage timing of the co-purchase edge-store
  * build at a given SF (where do the seconds go — gather, pair agg,
  * materialization layout).
  */
object EdgeLab {
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
      println(f"EDGELAB $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    time("warm-scan")(li.count())
    val supports = graft.operators.GraphOps.itemEdgeSupports(
      li, "l_orderkey", "l_partkey", pinWidth = true)
    time("agg-only-count")(println("rows=" + supports.count()))
    time("agg-again")(supports.count())
    val cp = time("localCheckpoint")(supports.localCheckpoint(true))
    time("cp-read")(cp.count())
    time("parquet-write") {
      supports.write.mode("overwrite").parquet("/tmp/edgelab_plain")
    }
    time("bucketed-write") {
      graft.sources.BucketedStore.writeBucketed(
        supports, "edgelab_bucketed", Seq("x"), 32, Seq("x", "y"))
    }
    time("bucketed-read")(spark.table("edgelab_bucketed").count())
    spark.stop()
  }
}
