package graft

import graft.tools.RecursiveReplay

/** The WITH RECURSIVE fixpoint replayer (dev tooling for the
  * crosscheck's third tier): UNION-distinct label propagation must
  * converge to DuckDB's working-table semantics, multiple independent
  * recursions chain in declaration order, and unsupported shapes
  * return None instead of guessing.
  */
class RecursiveReplaySpec extends SparkSpec {
  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  private def edges(): Unit =
    Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst").createOrReplaceTempView("edges0")

  test("label propagation converges to connected components") {
    edges()
    val sql =
      """WITH RECURSIVE
        | edges AS (SELECT src, dst FROM edges0),
        | reach(doc_id, lbl) AS (
        |   SELECT DISTINCT src, src FROM edges
        |   UNION
        |   SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.doc_id = e.dst),
        | grp AS (SELECT doc_id, min(lbl) AS group_id FROM reach GROUP BY doc_id)
        | SELECT doc_id, group_id FROM grp""".stripMargin
    val got = RecursiveReplay.replay(spark, sql).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // {1,2,3} labels to 1; {10,11} labels to 10 — needs >1 fixpoint
    // round (3 reaches 1 only through 2)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // the working views are dropped on exit
    assert(!spark.catalog.tableExists("reach") && !spark.catalog.tableExists("grp"))
  }

  test("two independent recursions chain in declaration order") {
    edges()
    // second recursion runs over the FIRST one's converged groups
    val sql =
      """WITH RECURSIVE
        | edges AS (SELECT src, dst FROM edges0),
        | reach(doc_id, lbl) AS (
        |   SELECT DISTINCT src, src FROM edges
        |   UNION
        |   SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.doc_id = e.dst),
        | grp AS (SELECT doc_id, min(lbl) AS group_id FROM reach GROUP BY doc_id),
        | g2 AS (SELECT DISTINCT group_id AS src, group_id + 100 AS dst FROM grp),
        | reach2(id, lbl) AS (
        |   SELECT src, src FROM g2
        |   UNION
        |   SELECT e.dst, r.lbl FROM g2 e JOIN reach2 r ON r.id = e.src)
        | SELECT id, lbl FROM reach2""".stripMargin
    val got = RecursiveReplay.replay(spark, sql).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (101L, 1L), (10L, 10L), (110L, 10L)))
  }

  test("unsupported shapes return None, not a guess") {
    edges()
    // no RECURSIVE keyword
    assert(RecursiveReplay.replay(spark,
      "WITH a AS (SELECT 1 AS x) SELECT * FROM a").isEmpty)
    // UNION ALL recursion (bag semantics — not the working-table
    // contract this replayer implements)
    assert(RecursiveReplay.replay(spark,
      """WITH RECURSIVE r(x) AS (
        | SELECT 1 UNION ALL SELECT x + 1 FROM r WHERE x < 3)
        | SELECT * FROM r""".stripMargin).isEmpty)
    // recursive member without a declared column list
    assert(RecursiveReplay.replay(spark,
      """WITH RECURSIVE r AS (
        | SELECT 1 AS x UNION SELECT x + 1 FROM r WHERE x < 3)
        | SELECT * FROM r""".stripMargin).isEmpty)
  }
}
