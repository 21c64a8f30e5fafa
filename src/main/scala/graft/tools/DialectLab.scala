package graft.tools

import org.apache.spark.sql.SparkSession

/** Fast shim-coverage probe (dev tooling): for every oracle, ANALYZE
  * (don't execute) the raw SQL and, when that fails, the
  * [[DuckDialect]]-shimmed SQL against Spark. Prints one line per
  * oracle (RAW_OK / SHIM_OK / SHIM_FAIL) and a summary — the quick
  * inner loop for growing the shim without paying a full
  * [[OracleCrossCheck]] execution pass.
  *
  * Usage: runMain graft.tools.DialectLab [sfDir] [namePrefix]
  */
object DialectLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val prefix = args.drop(1).headOption.getOrElse("")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dialect-lab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(new org.apache.spark.SparkConf().setAll(graft.sources.Tables.ReaderConfs))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables
    Seq(
      "region" -> Tables.region _, "nation" -> Tables.nation _,
      "customer" -> Tables.customer _, "supplier" -> Tables.supplier _,
      "part" -> Tables.part _, "orders" -> Tables.orders _,
      "lineitem" -> Tables.lineitem _, "events" -> Tables.events _,
      "documents" -> Tables.documents _, "embeddings" -> Tables.embeddings _
    ).foreach { case (name, rd) =>
      rd(spark, sfDir).createOrReplaceTempView(name)
    }
    def analyzes(sql: String): Option[String] =
      try { spark.sql(sql).queryExecution.analyzed; None }
      catch {
        case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\\n\\r\\t]", " ").take(160))
      }
    var raw = 0; var shim = 0; var fail = 0
    graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix)).foreach { case (name, sql) =>
      analyzes(sql) match {
        case None => raw += 1; println(s"DIALECT $name RAW_OK")
        case Some(_) =>
          val t = DuckDialect.toSpark(sql)
          analyzes(t) match {
            case None => shim += 1; println(s"DIALECT $name SHIM_OK")
            case Some(e2) =>
              fail += 1; println(s"DIALECT $name SHIM_FAIL $e2")
              if (sys.env.contains("PRINT_SHIM"))
                println(s"SHIM_SQL $name >>>\n$t\n<<<")
          }
      }
    }
    println(s"DIALECT_SUMMARY raw_ok=$raw shim_ok=$shim fail=$fail")
    spark.stop()
  }
}
