package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew tooling for hot join keys.
  *
  * AQE's skew-join handles sort-merge skew at runtime by splitting
  * oversized partitions; it cannot help when a single KEY is hot (one
  * key's rows always hash to one partition). Salting fixes that:
  * scatter the big side's rows across `salt` sub-keys and replicate
  * the small side once per sub-key — the hot key's rows now spread
  * over `salt` partitions, at the cost of a `salt`-times-larger small
  * side (which is the side that was small to begin with).
  *
  * Use when one side is orders of magnitude smaller but too big to
  * broadcast, and key frequencies are badly skewed (the classic
  * "events join symbol-metadata where one symbol is 30% of volume").
  */
object SkewOps {

  /** Inner equi-join of `big` and `small` on `keys`, salted `salt`
    * ways. Result is bit-identical to `big.join(small, keys)` — each
    * big row carries ONE deterministic salt value (hash of the whole
    * row, content-derived: reproducible across runs and retries) and
    * meets exactly the one matching replica of its small-side row.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int
  ): DataFrame = {
    require(salt >= 2, s"salting below 2 is a no-op: $salt")
    val bigSalted = big.withColumn(
      "__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val smallSalted = small.withColumn(
      "__salt",
      explode(array((0 until salt).map(lit): _*)))
    bigSalted
      .join(smallSalted, keys :+ "__salt")
      .drop("__salt")
  }
}
