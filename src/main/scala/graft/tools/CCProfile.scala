package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the DedupGroups fixpoint loop — prints per-phase
  * wall times so loop overhead is measured, not guessed.
  */
object CCProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val pairs = graft.functions.TextOps.minhashCandidatePairs(docs, "doc_id", "text", 4, 2, 3)
    t("pairs count")(pairs.count())
    val pairsM = t("pairs materialize")(pairs.localCheckpoint(true))

    // inline the loop with per-round phase timings
    val edges = t("edges build+cache")({
      val e = pairsM
        .select(col("doc_a").cast("long").as("src"), col("doc_b").cast("long").as("dst"))
        .unionByName(pairsM.select(
          col("doc_b").cast("long").as("src"), col("doc_a").cast("long").as("dst")))
        .distinct()
        .cache()
      e.count()
      e
    })
    var labels = t("seed labels")({
      val l = edges.select(col("src").as("doc_id"))
        .distinct()
        .withColumn("group_id", col("doc_id"))
        .localCheckpoint(true)
      l
    })
    def labelSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("group_id")).head().getLong(0)
    var prevSum = t("seed labelSum")(labelSum(labels))
    var converged = false
    var it = 0
    while (!converged && it < 10) {
      val updated = t(s"round $it join+agg+ckpt")({
        val neighborLabels = edges
          .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
          .select(col("src").as("doc_id"), col("group_id"))
        labels.unionByName(neighborLabels)
          .groupBy("doc_id")
          .agg(min("group_id").as("group_id"))
          .localCheckpoint(true)
      })
      val curSum = t(s"round $it labelSum")(labelSum(updated))
      labels = updated
      converged = curSum == prevSum
      prevSum = curSum
      it += 1
    }
    println(s"  rounds=$it labels=${labels.count()}")
    spark.stop()
  }
}
