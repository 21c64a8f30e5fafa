package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed catalog tables for co-located (shuffle-free) joins — the
  * 100 TB answer to repeated fact-fact joins on the same key: pay the
  * shuffle once at write time (`bucketBy` + `sortBy`), then every
  * subsequent equi-join on the bucket key needs no Exchange on either
  * side (and no sort, if sortBy matches).
  *
  * The reference's analog is the `ORDER BY (exchange, symbol, start,
  * interval)` sparse-index clustering (app/clickhouse_schema.py:145) —
  * ClickHouse co-locates by sort key inside each part; Spark co-locates
  * by bucket hash across files.
  */
object BucketedStore {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Seq.empty
  ): Unit = {
    val w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** [[writeBucketed]] with an explicit external location, so the
    * bucketed files land under a caller-owned path instead of the
    * session warehouse dir (which defaults to the process cwd —
    * derived stores must never write into the repo checkout).
    */
  def writeBucketedAt(
      df: DataFrame,
      table: String,
      path: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Seq.empty
  ): Unit = {
    import org.apache.spark.sql.functions.col
    // One file per bucket: Spark's read path only trusts the sortBy
    // metadata (and so elides the merge-join Sort) when each bucket is
    // a single file — repartitioning on the bucket keys makes every
    // writer task own exactly one bucket.
    val one = df.repartition(numBuckets, bucketCols.map(col): _*)
    val w = one.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts Catalyst plans a SortMergeJoin with ZERO shuffle
    * exchanges (asserted in BucketedStoreSpec).
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      on: Seq[String]
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on)
}
