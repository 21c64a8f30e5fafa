package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixpoint replay of DuckDB `WITH RECURSIVE` oracles (dev tooling;
  * never part of the engine). Spark SQL's recursive CTEs do not
  * support UNION-distinct recursion, so the 12 connected-components
  * dedup oracles stayed UNSUPPORTED on the [[OracleCrossCheck]] leg
  * through round 14 — yet their recursion is exactly the label
  * propagation the engine's own [[graft.operators.DedupGroups]]
  * iterates. This replayer executes the SAME oracle text by
  * semantics: materialize the non-recursive CTEs as temp views,
  * iterate the recursive member seed/step to the UNION-distinct
  * fixpoint (each round: step over the PREVIOUS round's new rows,
  * keep only never-seen rows — DuckDB's working-table contract), then
  * run the remainder of the statement over the converged relation.
  *
  * Supported shape: one `WITH RECURSIVE` statement containing exactly
  * ONE self-referencing CTE with a declared column list and a
  * top-level `UNION` (distinct) splitting seed from step. Everything
  * else returns None → the crosscheck keeps reporting UNSUPPORTED.
  * Every fragment passes through [[DuckDialect.toSpark]], so dialect
  * traps inside the CTE bodies get the same shim the flat oracles do.
  */
object RecursiveReplay {

  private[tools] case class Cte(name: String, cols: Seq[String], body: String)

  /** Parse `WITH [RECURSIVE] name[(cols)] AS (body), ... <final>`.
    * Returns (ctes in order, final statement) or None on any shape
    * surprise.
    */
  private[tools] def parse(sql: String): Option[(Seq[Cte], String)] = {
    val s = sql
    var i = DuckDialect.findWord(s, "WITH", 0, caseInsensitive = true)
    if (i != s.indexWhere(!_.isWhitespace)) return None
    i += 4
    val rec = DuckDialect.findWord(s, "RECURSIVE", i, caseInsensitive = true)
    if (rec >= 0 && s.substring(i, rec).isBlank) i = rec + "RECURSIVE".length
    val ctes = scala.collection.mutable.Buffer[Cte]()
    var done = false
    while (!done) {
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      var j = i
      while (j < s.length && DuckDialect.isIdent(s.charAt(j))) j += 1
      if (j == i) return None
      val name = s.substring(i, j)
      i = j
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      // optional declared column list: name(c1, c2) AS (
      var cols = Seq.empty[String]
      if (i < s.length && s.charAt(i) == '(') {
        val close = DuckDialect.matchParen(s, i)
        if (close < 0) return None
        var k = close + 1
        while (k < s.length && s.charAt(k).isWhitespace) k += 1
        if (s.regionMatches(true, k, "AS", 0, 2)) {
          cols = s.substring(i + 1, close).split(",").map(_.trim).toSeq
          i = close + 1
          while (i < s.length && s.charAt(i).isWhitespace) i += 1
        } else return None
      }
      if (!s.regionMatches(true, i, "AS", 0, 2)) return None
      i += 2
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (i >= s.length || s.charAt(i) != '(') return None
      val close = DuckDialect.matchParen(s, i)
      if (close < 0) return None
      ctes += Cte(name, cols, s.substring(i + 1, close))
      i = close + 1
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (i < s.length && s.charAt(i) == ',') i += 1
      else done = true
    }
    if (i >= s.length) None else Some((ctes.toSeq, s.substring(i)))
  }

  /** Seed/step split of a recursive member: the position of the
    * top-level `UNION` (distinct, not ALL), or -1.
    */
  private def unionSplit(body: String): Int = {
    var p = DuckDialect.findWordAtDepth0(body, "UNION", 0, body.length)
    var found = -1
    while (p >= 0 && found < 0) {
      var k = p + 5
      while (k < body.length && body.charAt(k).isWhitespace) k += 1
      if (body.regionMatches(true, k, "ALL", 0, 3) &&
          (k + 3 >= body.length || !DuckDialect.isIdent(body.charAt(k + 3))))
        p = DuckDialect.findWordAtDepth0(body, "UNION", p + 5, body.length)
      else found = p
    }
    found
  }

  /** Execute; None = not the supported shape (callers keep their
    * UNSUPPORTED reporting). Throws on execution errors (callers
    * report those too). Registered temp views are dropped on exit.
    *
    * CTEs are processed in declaration order; EACH self-referencing
    * CTE runs its own UNION-distinct fixpoint over the views
    * registered so far (q_dedup_stages chains two independent
    * label-propagation recursions — reach over minhash edges, reach2
    * over cosine edges). Mutual/forward recursion simply fails to
    * resolve the not-yet-registered name, surfacing as an execution
    * error, not a silent wrong answer.
    */
  def replay(spark: SparkSession, sql: String): Option[DataFrame] = {
    if (DuckDialect.findWord(sql, "RECURSIVE", 0, caseInsensitive = true) < 0)
      return None
    val (ctes, finalSql) = parse(sql).getOrElse(return None)
    def isSelfRef(c: Cte): Boolean =
      DuckDialect.findWord(c.body, c.name, 0, caseInsensitive = true) >= 0
    if (!ctes.exists(isSelfRef)) return None
    // every recursive member must carry a declared column list and a
    // top-level UNION-distinct seed/step split, or the whole statement
    // stays UNSUPPORTED (checked up front so no views leak for shapes
    // we won't run)
    if (ctes.exists(c => isSelfRef(c) &&
        (c.cols.isEmpty || unionSplit(c.body) < 0))) return None
    // Materialize AND sever plan lineage: localCheckpoint alone keeps
    // the origin plan's constraints/exprIds on its LogicalRDD, and the
    // next round's unionByName dies remapping a carried constraint
    // whose attribute is not in the child's output (UnionBase.
    // rewriteConstraints: "key not found: lbl#N") — the except-plan
    // constraints reference anti-join-side attrs. Round-tripping the
    // checkpointed rows through createDataFrame yields a clean
    // LogicalRDD: fresh exprIds, no origin constraints.
    def pin(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint(true)
      spark.createDataFrame(ck.rdd, ck.schema)
    }
    val registered = scala.collection.mutable.Buffer[String]()
    def register(name: String, df: DataFrame): Unit = {
      df.createOrReplaceTempView(name)
      if (!registered.contains(name)) registered += name
    }
    try {
      ctes.foreach { c =>
        if (!isSelfRef(c)) {
          register(c.name, spark.sql(DuckDialect.toSpark(c.body)))
        } else {
          val u = unionSplit(c.body)
          val seedSql = c.body.substring(0, u)
          val stepSql = c.body.substring(u + 5)
          var seen = pin(spark.sql(DuckDialect.toSpark(seedSql))
            .toDF(c.cols: _*).distinct())
          var frontier = seen
          var rounds = 0
          var converged = false
          while (!converged) {
            rounds += 1
            require(rounds <= 500,
              s"RecursiveReplay: no fixpoint after 500 rounds for CTE ${c.name}")
            register(c.name, frontier)
            val delta = pin(spark.sql(DuckDialect.toSpark(stepSql))
              .toDF(c.cols: _*).except(seen))
            if (delta.isEmpty) converged = true
            else {
              seen = pin(seen.unionByName(delta))
              frontier = delta
            }
          }
          register(c.name, seen)
        }
      }
      // materialize BEFORE dropping the temp views the plan reads
      Some(pin(spark.sql(DuckDialect.toSpark(finalSql))))
    } finally registered.foreach(spark.catalog.dropTempView(_))
  }
}
