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

  /** Execute; None = not the supported shape (callers keep their
    * UNSUPPORTED reporting). Throws on execution errors (callers
    * report those too). Registered temp views are dropped on exit.
    */
  def replay(spark: SparkSession, sql: String): Option[DataFrame] = {
    if (DuckDialect.findWord(sql, "RECURSIVE", 0, caseInsensitive = true) < 0)
      return None
    val (ctes, finalSql) = parse(sql).getOrElse(return None)
    val selfRef = ctes.filter(c =>
      DuckDialect.findWord(c.body, c.name, 0, caseInsensitive = true) >= 0)
    if (selfRef.size != 1) return None
    val recCte = selfRef.head
    if (recCte.cols.isEmpty) return None
    // top-level UNION (distinct, not ALL) splits seed from step
    val u = {
      var p = DuckDialect.findWordAtDepth0(recCte.body, "UNION", 0, recCte.body.length)
      var found = -1
      while (p >= 0 && found < 0) {
        var k = p + 5
        while (k < recCte.body.length && recCte.body.charAt(k).isWhitespace) k += 1
        if (recCte.body.regionMatches(true, k, "ALL", 0, 3) &&
            (k + 3 >= recCte.body.length || !DuckDialect.isIdent(recCte.body.charAt(k + 3))))
          p = DuckDialect.findWordAtDepth0(recCte.body, "UNION", p + 5, recCte.body.length)
        else found = p
      }
      found
    }
    if (u < 0) return None
    val seedSql = recCte.body.substring(0, u)
    val stepSql = recCte.body.substring(u + 5)
    val registered = scala.collection.mutable.Buffer[String]()
    try {
      val (pre, post) = ctes.filterNot(_ eq recCte)
        .partition(c => ctes.indexWhere(_ eq c) < ctes.indexWhere(_ eq recCte))
      pre.foreach { c =>
        spark.sql(DuckDialect.toSpark(c.body)).createOrReplaceTempView(c.name)
        registered += c.name
      }
      val cols = recCte.cols
      var seen = spark.sql(DuckDialect.toSpark(seedSql))
        .toDF(cols: _*).distinct().localCheckpoint(true)
      var frontier = seen
      var rounds = 0
      var converged = false
      while (!converged) {
        rounds += 1
        require(rounds <= 500,
          s"RecursiveReplay: no fixpoint after 500 rounds for CTE ${recCte.name}")
        frontier.createOrReplaceTempView(recCte.name)
        if (!registered.contains(recCte.name)) registered += recCte.name
        val delta = spark.sql(DuckDialect.toSpark(stepSql))
          .toDF(cols: _*).except(seen).localCheckpoint(true)
        if (delta.isEmpty) converged = true
        else {
          seen = seen.unionByName(delta).localCheckpoint(true)
          frontier = delta
        }
      }
      seen.createOrReplaceTempView(recCte.name)
      post.foreach { c =>
        spark.sql(DuckDialect.toSpark(c.body)).createOrReplaceTempView(c.name)
        registered += c.name
      }
      // materialize BEFORE dropping the temp views the plan reads
      Some(spark.sql(DuckDialect.toSpark(finalSql)).localCheckpoint(true))
    } finally registered.foreach(spark.catalog.dropTempView(_))
  }
}
