package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten cascade deletion over the customer → orders →
  * lineitem foreign-key chain: given a tombstone predicate on the
  * customer table, compute the transitive closure of rows that must
  * go, either as cleaned tables ([[cascadeDelete]]) or as the audit
  * report a compliance run records ([[cascadeDeleteAudit]]).
  *
  * Scale posture: the tombstone key set is a deletion list — orders of
  * magnitude under the fact tables — so it BROADCASTS into every
  * membership probe; the fact tables are scanned once each and never
  * shuffled (flags are computed by broadcast left joins, counts by
  * map-side-combinable aggregates). The orders→lineitem hop reuses the
  * purged-order keys the same way. A deletion list too large to
  * broadcast is a backfill, not a deletion run — route it through a
  * shuffle join by dropping the hint at the call site.
  */
object PurgeOps {

  /** The three cleaned tables, tombstoned rows removed transitively. */
  def cascadeDelete(
      customer: DataFrame,
      orders: DataFrame,
      lineitem: DataFrame,
      tombstone: Column
  ): (DataFrame, DataFrame, DataFrame) = {
    val deadCust = customer.filter(tombstone).select(col("c_custkey"))
    val keptOrders = orders.join(
      broadcast(deadCust), col("o_custkey") === col("c_custkey"), "left_anti")
    val deadOrders = orders.join(
      broadcast(deadCust), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
    val keptLineitem = lineitem.join(
      broadcast(deadOrders), col("l_orderkey") === col("o_orderkey"), "left_anti")
    (customer.filter(!tombstone), keptOrders, keptLineitem)
  }

  /** Per-table purge audit: (table_name, n_before, n_purged, n_after).
    * Each table is scanned exactly once; the purged flag comes from a
    * broadcast membership probe, so the counts are three independent
    * map-side-combinable aggregates unioned into one 3-row frame.
    */
  def cascadeDeleteAudit(
      customer: DataFrame,
      orders: DataFrame,
      lineitem: DataFrame,
      tombstone: Column
  ): DataFrame = {
    val deadCust = customer.filter(tombstone).select(col("c_custkey").as("__dc"))
    val custAudit = customer
      .agg(count(lit(1)).as("n_before"),
        sum(when(tombstone, 1L).otherwise(0L)).as("n_purged"))
      .select(lit("customer").as("table_name"), col("n_before"), col("n_purged"))
    val flaggedOrders = orders.join(
      broadcast(deadCust), col("o_custkey") === col("__dc"), "left")
    val orderAudit = flaggedOrders
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("__dc").isNotNull, 1L).otherwise(0L)).as("n_purged"))
      .select(lit("orders").as("table_name"), col("n_before"), col("n_purged"))
    val deadOrders = orders.join(
      broadcast(deadCust), col("o_custkey") === col("__dc"), "left_semi")
      .select(col("o_orderkey").as("__do"))
    val lineAudit = lineitem.join(
      broadcast(deadOrders), col("l_orderkey") === col("__do"), "left")
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("__do").isNotNull, 1L).otherwise(0L)).as("n_purged"))
      .select(lit("lineitem").as("table_name"), col("n_before"), col("n_purged"))
    custAudit.unionByName(orderAudit).unionByName(lineAudit)
      .withColumn("n_after", col("n_before") - col("n_purged"))
  }

  /** k-anonymity / l-diversity audit: for every quasi-identifier
    * combination, the group size and the number of DISTINCT sensitive
    * values it hides, with pass flags against `k` and `l` — the
    * release-gate check a training-data export runs after
    * [[graft.functions.TextOps.redactPii]]-style scrubbing (a group of
    * fewer than k rows re-identifies; one with fewer than l sensitive
    * values discloses even without re-identification).
    *
    * One hash aggregate on the quasi columns; the exact distinct count
    * rides the same shuffle (partial distinct aggregation). Groups
    * come back sorted nowhere — the caller filters `meets_k AND
    * meets_l` or aggregates the flags; both stay map-side-combinable.
    */
  def kAnonymityReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Long,
      l: Long
  ): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"k=$k, l=$l must be positive")
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("group_size"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("meets_k", col("group_size") >= k)
      .withColumn("meets_l", col("l_distinct") >= l)
  }
}
