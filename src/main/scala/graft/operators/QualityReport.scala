package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality report — the engine form of the
  * reference's verification pass (app/data_quality_check.py runs a
  * battery of per-table checks: completeness, gaps, freshness,
  * duplicate detection) generalized into composable constraints
  * evaluated in as few passes as the constraint classes allow:
  *
  *  - ROW constraints (not-null, range, regex, custom predicate):
  *    conditional counts folded into ONE aggregate — a single scan
  *    regardless of how many rules are declared.
  *  - KEY uniqueness: one groupBy on the key, counting groups with
  *    duplicates and the rows they hold.
  *  - REFERENTIAL integrity: a broadcast-able anti-join counting
  *    orphans (the dimension side is distinct keys, small by nature).
  *
  * Output is one row per rule: (rule, violations, total) — the shape
  * a scheduler alerts on (violations > 0), mirroring how the
  * reference's checker reports each probe.
  */
object QualityReport {

  /** A row-level rule: name + a violation predicate. */
  final case class RowRule(name: String, violated: Column)

  def notNull(name: String, c: Column): RowRule =
    RowRule(name, c.isNull)
  def inRange(name: String, c: Column, lo: Double, hi: Double): RowRule =
    RowRule(name, c.isNull || c < lo || c > hi)
  def matches(name: String, c: Column, regex: String): RowRule =
    RowRule(name, c.isNull || !c.rlike(regex))

  /** All row rules in one aggregate: one scan, no shuffle beyond the
    * single-row final combine.
    */
  def rowReport(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    // rules are indexed internally (__r0, __r1, ...) so display names
    // never become column names: dotted, duplicated, or
    // reserved-looking rule names all stay legal
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      count(when(r.violated, 1)).as(s"__r$i")
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"__r$i").as("violations"))
    }
    one.select(explode(array(pairs: _*)).as("__x"), col("__total"))
      .select(col("__x.rule").as("rule"),
        col("__x.violations").as("violations"),
        col("__total").as("total"))
  }

  /** Duplicate-key probe: groups with more than one row. Returns one
    * row: (rule, violations = rows beyond the first per key, total).
    */
  def uniqueKey(df: DataFrame, name: String, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        coalesce(sum(col("__n") - 1), lit(0L)).as("violations"),
        coalesce(sum(col("__n")), lit(0L)).as("total"))
      .select(lit(name).as("rule"), col("violations"), col("total"))
  }

  /** Orphan probe: child rows whose key has no match in the parent's
    * key column. The parent side is reduced to distinct keys before
    * the (broadcast-friendly) anti-join.
    */
  def refIntegrity(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      name: String
  ): DataFrame = {
    val keys = parent.select(col(parentKey).as(childKey)).distinct()
    val orphans = child.select(col(childKey))
      .join(broadcast(keys), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val total = child.agg(count(lit(1)).as("total"))
    orphans.crossJoin(total)
      .select(lit(name).as("rule"), col("violations"), col("total"))
  }

  /** Union any number of probe outputs into the single report. */
  def report(probes: DataFrame*): DataFrame =
    probes.reduce(_.unionByName(_))

  /** Streaming form of [[rowReport]]: the same one-aggregate rule
    * evaluation grouped per event-time window, so a live pipeline
    * watches violation counts per interval (update/complete mode).
    * Identical rule declarations run in batch backfill and live
    * monitoring — one definition, two execution modes.
    */
  def streamingRowReport(
      df: DataFrame,
      tsCol: String,
      windowLen: String,
      watermark: String,
      rules: Seq[RowRule]
  ): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      count(when(r.violated, 1)).as(s"__r$i")
    } :+ count(lit(1)).as("__total")
    val one = df
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("__w"))
      .agg(aggs.head, aggs.tail: _*)
    val pairs = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"__r$i").as("violations"))
    }
    one.select(col("__w.start").as("window_start"),
        explode(array(pairs: _*)).as("__x"), col("__total"))
      .select(col("window_start"), col("__x.rule").as("rule"),
        col("__x.violations").as("violations"),
        col("__total").as("total"))
  }
}
