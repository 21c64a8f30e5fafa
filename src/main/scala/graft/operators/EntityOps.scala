package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching over a name/title dictionary — the
  * entity-resolution step a corpus build runs to unify near-identical
  * titles and product/entity names before counting them as distinct
  * (the fuzzy sibling of exact dedup, reference contract
  * app/clickhouse_schema.py:143).
  *
  * Never all-pairs: candidates come from equi-join BLOCKING passes
  * (first token, last token), unioned and deduped, and only candidates
  * pay the edit-distance comparison. Each block key is a real column
  * equi-join, so at 100 TB the candidate set scales with the block
  * sizes, not the dictionary squared; a degenerate block (every name
  * sharing one token) is the same hot-bucket exposure the near-dup
  * self-joins guard against, so the same cap applies here.
  *
  * Recall property: a pair is found iff it shares a first OR last
  * token exactly. Within edit distance d, two-token names can in
  * principle disagree on both tokens (d split 1+1) — add more passes
  * (token-sort key, prefix key) to tighten recall; the two standard
  * passes are what the oracle mirrors.
  */
object EntityOps {

  /** Distinct name pairs (name_a < name_b) within `maxDist` edit
    * distance, found via two blocking passes. `bucketCap` drops
    * degenerate blocks (over-cap key counts) the same way the banded
    * near-dup joins do — a block that large is one token shared by a
    * constant fraction of the dictionary, i.e. a stopword, not a
    * match signal.
    */
  def fuzzyNamePairs(
      df: DataFrame,
      nameCol: String,
      maxDist: Int,
      bucketCap: Int = 10000
  ): DataFrame = {
    require(maxDist >= 0, s"maxDist=$maxDist must be non-negative")
    require(bucketCap > 1, s"bucketCap=$bucketCap must exceed 1")
    val names = df.select(col(nameCol).as("name")).distinct()
    val keyed = names.select(
      col("name"),
      substring_index(col("name"), " ", 1).as("__b1"),
      substring_index(col("name"), " ", -1).as("__b2"))

    def pass(key: String): DataFrame = {
      val capped = keyed
        .withColumn("__bn",
          count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col(key))))
        .where(col("__bn") <= bucketCap)
      val a = capped.select(col("name").as("name_a"), col(key).as("__k"))
      val b = capped.select(col("name").as("name_b"), col(key).as("__k"))
      a.join(b, a("__k") === b("__k") && col("name_a") < col("name_b"))
        .select(col("name_a"), col("name_b"))
    }

    pass("__b1").union(pass("__b2")).distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= maxDist)
  }

  /** What `bucketCap` does to the blocking keys of both passes on
    * THIS dictionary — the observability companion to
    * [[fuzzyNamePairs]] ([[CapReport.of]]). Buckets are (pass, key):
    * the first-token and last-token blocks report together.
    */
  def blockingCapReport(
      df: DataFrame,
      nameCol: String,
      bucketCap: Int = 10000
  ): DataFrame = {
    val names = df.select(col(nameCol).as("name")).distinct()
    val blocks = names.select(col("name"), lit("first").as("pass"),
        substring_index(col("name"), " ", 1).as("blk"))
      .union(names.select(col("name"), lit("last").as("pass"),
        substring_index(col("name"), " ", -1).as("blk")))
    CapReport.of(blocks, Seq("pass", "blk"), "name", bucketCap.toLong)
  }
}
