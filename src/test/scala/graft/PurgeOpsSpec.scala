package graft

import graft.operators.PurgeOps
import org.apache.spark.sql.functions._

class PurgeOpsSpec extends SparkSpec {
  import spark.implicits._

  // customer 2 is tombstoned; it owns order 20 which owns two lineitems
  private def fixtures = {
    val customer = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("c_custkey", "c_name")
    val orders = Seq((10L, 1L), (20L, 2L), (30L, 3L), (31L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1), (20L, 1), (20L, 2), (30L, 1))
      .toDF("l_orderkey", "l_linenumber")
    (customer, orders, lineitem)
  }

  test("cascadeDelete removes the transitive closure of tombstoned customers") {
    val (c, o, l) = fixtures
    val (kc, ko, kl) = PurgeOps.cascadeDelete(c, o, l, col("c_custkey") === 2)
    assert(kc.select("c_custkey").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(ko.select("o_orderkey").as[Long].collect().sorted.toSeq == Seq(10L, 30L, 31L))
    assert(kl.select("l_orderkey", "l_linenumber").as[(Long, Int)]
      .collect().sorted.toSeq == Seq((10L, 1), (30L, 1)))
  }

  test("cascadeDeleteAudit counts agree with the cleaned tables") {
    val (c, o, l) = fixtures
    val audit = PurgeOps.cascadeDeleteAudit(c, o, l, col("c_custkey") === 2)
      .select("table_name", "n_before", "n_purged", "n_after")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(audit == Seq(
      ("customer", 3L, 1L, 2L),
      ("lineitem", 4L, 2L, 2L),
      ("orders", 4L, 1L, 3L)))
    // audit's n_after equals the cleaned tables' actual row counts
    val (kc, ko, kl) = PurgeOps.cascadeDelete(c, o, l, col("c_custkey") === 2)
    val after = audit.map(a => a._1 -> a._4).toMap
    assert(kc.count() == after("customer"))
    assert(ko.count() == after("orders"))
    assert(kl.count() == after("lineitem"))
  }

  test("empty tombstone set purges nothing") {
    val (c, o, l) = fixtures
    val audit = PurgeOps.cascadeDeleteAudit(c, o, l, lit(false))
      .select("n_purged").as[Long].collect().toSeq
    assert(audit == Seq(0L, 0L, 0L))
  }

  test("kAnonymityReport: group sizes, distinct sensitive values, and both pass flags") {
    val rows = Seq(
      // quasi group (1, "a"): 3 rows, 2 distinct salaries
      (1, "a", 100.0), (1, "a", 100.0), (1, "a", 200.0),
      // quasi group (2, "b"): 1 row — re-identifiable
      (2, "b", 300.0))
      .toDF("region", "segment", "salary")
    val got = PurgeOps.kAnonymityReport(
      rows, Seq("region", "segment"), "salary", k = 2L, l = 2L)
      .select("region", "segment", "group_size", "l_distinct", "meets_k", "meets_l")
      .as[(Int, String, Long, Long, Boolean, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got((1, "a")) == ((3L, 2L, true, true)))
    assert(got((2, "b")) == ((1L, 1L, false, false)))
  }
}
