package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch runner: time + explain individual pipeline stages.
  * `sbt "runMain graft.tools.PlanLab <what> <sfDir>"`.
  */
object PlanLab {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("minhash")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[planlab] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    what match {
      case "minhash" =>
        import graft.functions.TextOps
        import graft.sources.Tables
        val docs = Tables.documents(spark, dir)
        val sh = docs.select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.explode(
            TextOps.shingles(TextOps.tokens(org.apache.spark.sql.functions.col("text")), 3)).as("__s"))
        time("shingle explode count")(println(sh.count()))
        val sig = TextOps.minhashSignatures(docs, "doc_id", "text", 8, 3)
        time("signatures count")(println(sig.count()))
        val pairs = TextOps.minhashCandidatePairs(docs, "doc_id", "text", 4, 2, 3)
        pairs.explain("formatted")
        time("pairs count")(println(pairs.count()))
      case "ext" =>
        graft.GraftExtensions.register(spark)
        spark.sql(
          """SELECT simhash64(split('a b c a', ' ')) AS sh,
                    dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
                    word_shingles(split('a b c', ' '), 2) AS ws,
                    time_bucket_fixed(TIMESTAMP '2024-01-01 08:22:11', '15m') AS tb""")
          .show(truncate = false)
      case "bench1" =>
        val name = args(1)
        val sfDir = args(2)
        val q = graft.SparkEntry.queries(name)(spark, sfDir)
        q.explain("formatted")
        time(s"$name count")(println(q.count()))
    }
    spark.stop()
  }
}
