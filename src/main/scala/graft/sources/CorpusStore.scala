package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized training-corpus store: the write-side terminus of the
  * corpus pipeline (redact → dedup → gates → split), mirroring the
  * month-partitioned candle stores ([[graft.operators.RollupStore]])
  * on the document axis.
  *
  * Layout: parquet partitioned by the split assignment and any further
  * routing columns (lang, source), so a trainer reading one split/
  * language touches only its directories (partition pruning — the
  * same `PartitionFilters` contract PruningSpec asserts for the candle
  * stores), and `maxRecordsPerFile` bounds file sizes so a 100 TB
  * corpus lands as uniformly-sized shards regardless of task count
  * (one oversized task can't emit a 100 GB file).
  */
object CorpusStore {

  /** Write `docs` partitioned by `partitionCols` with bounded shards. */
  def write(
      docs: DataFrame,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long
  ): Unit =
    docs.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Per-partition document counts from the materialized store —
    * the corpus-manifest summary (rows scan only the requested
    * partition columns, pruned to metadata where possible).
    */
  def manifest(spark: SparkSession, path: String, partitionCols: Seq[String]): DataFrame =
    read(spark, path)
      .groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"))
}
