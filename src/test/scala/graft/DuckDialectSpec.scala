package graft

import graft.tools.DuckDialect
import graft.tools.DuckDialect.toSpark

/** The DuckDB→Spark oracle transpiler (dev tooling for the
  * second-engine crosscheck leg): string-level rewrites plus a few
  * executed equivalence checks where the semantics could plausibly
  * drift (1-based indexing, ordered aggregates, comprehension zip,
  * empty-series guards, signed hex reinterpretation).
  */
class DuckDialectSpec extends SparkSpec {

  private def run1(sql: String): Any =
    spark.sql(sql).collect().head.get(0)

  test("word maps apply only in function position; types map anywhere") {
    assert(toSpark("CAST(x AS VARCHAR)") == "CAST(x AS STRING)")
    assert(toSpark("CAST(x AS HUGEINT) * y") == "CAST(x AS DECIMAL(38,0)) * y")
    assert(toSpark("SELECT len(t) AS len FROM x") == "SELECT size(t) AS len FROM x")
    assert(toSpark("arg_max(v, ts)") == "max_by(v, ts)")
    assert(toSpark("epoch_us(ts) // 900000000") == "unix_micros(ts)  div  900000000")
    // quoted text is opaque
    assert(toSpark("SELECT 'a // b' AS s") == "SELECT 'a // b' AS s")
  }

  test("time_bucket: sub-month widths floor epoch-aligned; month truncs") {
    assert(toSpark("time_bucket(INTERVAL '15 minutes', ts)") ==
      "timestamp_micros((unix_micros(ts) div 900000000L) * 900000000L)")
    assert(toSpark("time_bucket(INTERVAL '1 hour', ts)") ==
      "timestamp_micros((unix_micros(ts) div 3600000000L) * 3600000000L)")
    assert(toSpark("time_bucket(INTERVAL '1 month', ts)") == "date_trunc('month', ts)")
    // DuckDB's 2000-01-01 default origin == epoch alignment for every
    // width that divides 946684800 s — spot-check the identity
    assert(946684800L % (15 * 60) == 0 && 946684800L % 86400 == 0)
  }

  test("brackets: 1-based indexing, slices, types, literals, comprehensions") {
    assert(toSpark("t[i]") == "try_element_at(t, i)")
    assert(toSpark("string_split(s, ' ')[2]") == "try_element_at(split(s, ' '), 2)")
    assert(toSpark("CAST(e AS DOUBLE[])") == "CAST(e AS ARRAY<DOUBLE>)")
    assert(toSpark("l[2:4]") == "slice(l, 2, (4) - (2) + 1)")
    assert(toSpark("SELECT ['a', 'b'] AS l") == "SELECT array('a', 'b') AS l")
    assert(toSpark("[t[i] for i in generate_series(1, len(t)-1)]") ==
      "transform((CASE WHEN (size(t)-1) >= (1) THEN sequence(1, size(t)-1) " +
        "ELSE slice(sequence(1, 1), 1, 0) END), i -> try_element_at(t, i))")
    // executed: 1-based index agreement incl. out-of-range → NULL
    assert(run1("SELECT " + toSpark("array(10, 20)[2]")) == 20)
    assert(run1("SELECT " + toSpark("array(10, 20)[3]")) == null)
  }

  test("struct literals and struct_pack become named_struct") {
    assert(toSpark("{'w1': t[i], 'w2': u}") ==
      "named_struct('w1', try_element_at(t, i), 'w2', u)")
    assert(toSpark("struct_pack(d := x, n := y)") == "named_struct('d', x, 'n', y)")
  }

  test("ordered aggregates sort (key, value) structs — executed") {
    val got = spark.sql(
      "SELECT " + toSpark("string_agg(w, ' ' ORDER BY p)") +
        " AS s FROM VALUES (3, 'c'), (1, 'a'), (2, 'b') AS t(p, w)"
    ).collect().head.getString(0)
    assert(got == "a b c")
    val multi = spark.sql(
      "SELECT " + toSpark("list(w ORDER BY p, w)") +
        " AS l FROM VALUES (1, 'b'), (1, 'a'), (0, 'z') AS t(p, w)"
    ).collect().head.getSeq[String](0)
    assert(multi == Seq("z", "a", "b"))
  }

  test("scalar series guard the empty case instead of counting down") {
    // DuckDB: generate_series(1, 0) = [] — Spark sequence would DESCEND
    assert(run1("SELECT size(" + toSpark("generate_series(1, 0)") + ")") == 0)
    assert(run1("SELECT size(" + toSpark("generate_series(1, 3)") + ")") == 3)
    assert(run1("SELECT size(" + toSpark("range(4)") + ")") == 4)
    assert(run1("SELECT size(" + toSpark("range(2, 2)") + ")") == 0)
  }

  test("FROM generate_series becomes a lateral-free explode subquery") {
    val t = toSpark("SELECT g.id FROM generate_series(0, 4) AS g(id)")
    assert(t == "SELECT g.id FROM (SELECT explode(sequence(0, 4)) AS id) AS g")
    assert(spark.sql(t).count() == 5)
  }

  test("shift operators become shiftleft/shiftright — executed, bit-exact") {
    assert(toSpark("(h >> j) & 1") == "(shiftright(h, j)) & 1")
    assert(toSpark("CAST(1 AS UBIGINT) << CAST(j AS INT)") ==
      "shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))")
    assert(run1("SELECT " + toSpark("(12 >> 2) & 1")) == 1)
  }

  test("hex casts: unsigned value for modular math, signed bits for shifts") {
    val unsignedQ = toSpark("SELECT CAST(('0x' || 'ffffffffffffffff') AS UBIGINT) AS v")
    assert(run1(unsignedQ).toString == "18446744073709551615")
    // a query that shifts gets the signed reinterpretation (same bits)
    val signedQ = toSpark(
      "SELECT (CAST(('0x' || 'ffffffffffffffff') AS UBIGINT) >> 63) & 1 AS b")
    assert(signedQ.contains("conv('ffffffffffffffff', 16, -10)"))
    assert(run1(signedQ) == 1L)
    // narrow targets (<= 8 hex digits): plain unsigned conv into BIGINT
    assert(run1(toSpark("SELECT CAST(('0x' || 'cfcd') AS INT) AS v")) == 53197L)
    // the all-ones UBIGINT complement mask survives ANSI as signed -1
    assert(run1(toSpark(
      "SELECT xor(CAST(5 AS UBIGINT), CAST(18446744073709551615 AS UBIGINT)) AS m")) == -6L)
  }

  test("qualify unrolls into a filtered subquery — executed") {
    val t = toSpark(
      "SELECT * FROM (SELECT p, w FROM VALUES (1, 'a'), (1, 'b'), (2, 'c') AS t(p, w) " +
        "QUALIFY count(*) OVER (PARTITION BY p) <= 1)")
    assert(spark.sql(t).collect().map(_.getString(1)).toSeq == Seq("c"))
  }

  test("regexp_replace drops DuckDB's 'g' flag; extract_all defaults to group 0") {
    assert(toSpark("regexp_replace(s, 'a+', 'x', 'g')") == "regexp_replace(s, 'a+', 'x')")
    assert(toSpark("regexp_extract_all(s, '[.!?]+')") == "regexp_extract_all(s, '[.!?]+', 0)")
  }

  test("ignore-nulls moves from inside the call to after it") {
    assert(toSpark("lag(x IGNORE NULLS) OVER (ORDER BY i)").trim ==
      "lag(x) IGNORE NULLS  OVER (ORDER BY i)".trim)
  }

  test("backslashes in literals are doubled (DuckDB literals are escape-free)") {
    assert(toSpark("""regexp_extract_all(text, '[^A-Za-z0-9\s]')""") ==
      """regexp_extract_all(text, '[^A-Za-z0-9\\s]', 0)""")
    // executed: the regex must still see \s after Spark's parser
    assert(run1("SELECT size(" + toSpark(
      """regexp_extract_all('a b!c', '[^A-Za-z0-9\s]')""") + ")") == 1)
  }

  test("indexed lambdas shift to DuckDB's 1-based position — executed") {
    val t = toSpark("list_filter(l, (x, i) -> list_position(l, x) = i)")
    assert(t == "filter(l, (x, i) -> nullif(array_position(l, x), 0) = (i + 1))")
    // first-occurrence keep over a dup list
    val kept = spark.sql(
      "SELECT " + toSpark("list_filter(l, (x, i) -> list_position(l, x) = i)") +
        " AS k FROM (SELECT array('a', 'b', 'a') AS l)"
    ).collect().head.getSeq[String](0)
    assert(kept == Seq("a", "b"))
  }

  test("bare ANTI/SEMI JOIN gain the LEFT Spark requires — executed") {
    assert(toSpark("FROM a ANTI JOIN b ON a.x = b.x") ==
      "FROM a LEFT ANTI JOIN b ON a.x = b.x")
    assert(toSpark("FROM a LEFT ANTI JOIN b ON a.x = b.x") ==
      "FROM a LEFT ANTI JOIN b ON a.x = b.x")
    // without the rewrite Spark parses `a ANTI` as an alias and the
    // join turns INNER — the opposite rows
    val t = toSpark(
      "SELECT count(*) AS n FROM (SELECT 1 AS x UNION ALL SELECT 2) a " +
        "ANTI JOIN (SELECT 2 AS x) b ON a.x = b.x")
    assert(run1(t) == 1L)
  }

  test("dayofweek shifts to DuckDB's 0=Sunday origin") {
    assert(toSpark("dayofweek(ts) IN (0, 6)") == "(dayofweek(ts) - 1) IN (0, 6)")
    // 2024-01-07 is a Sunday: DuckDB dayofweek = 0
    assert(run1("SELECT " + toSpark("dayofweek(DATE '2024-01-07')")) == 0)
  }

  test("zipped unnests become posexplode — executed, both index origins") {
    // 1-based: unnest(A), unnest(generate_series(1, len(A)))
    val t1 = toSpark(
      "SELECT unnest(l) AS x, unnest(generate_series(1, len(l))) AS i " +
        "FROM (SELECT ['a', 'b'] AS l)")
    val r1 = spark.sql(t1).select("x", "i").collect()
      .map(r => (r.getString(0), r.get(1).toString.toLong)).toSet
    assert(r1 == Set(("a", 1L), ("b", 2L)), s"got $r1 via\n$t1")
    // 0-based: unnest(A), unnest(range(len(A)))
    val t0 = toSpark(
      "SELECT unnest(l) AS x, unnest(range(len(l))) AS i FROM (SELECT ['a', 'b'] AS l)")
    val r0 = spark.sql(t0).select("x", "i").collect()
      .map(r => (r.getString(0), r.get(1).toString.toLong)).toSet
    assert(r0 == Set(("a", 0L), ("b", 1L)), s"got $r0 via\n$t0")
  }

  test("list folds: reduce seeds with first element; inner product folds left") {
    assert(run1("SELECT " + toSpark("list_reduce(array(5, 2, 1), (a, b) -> a - b)")) == 2)
    assert(run1("SELECT " + toSpark(
      "list_inner_product(array(1.0, 2.0), array(3.0, 4.0))")) == 11.0)
    assert(run1("SELECT " + toSpark("list_sum(array(1, 2, 3))")) == 6L)
  }

  test("2-arg regexp_extract defaults to group 0 — executed") {
    // DuckDB's 2-arg form returns the whole match; Spark's default
    // idx=1 is a RUNTIME ERROR on a group-less pattern
    assert(run1("SELECT " + toSpark("regexp_extract('big ship', '[^ ]+$')")) ==
      "ship")
    // the 3-arg form passes through untouched
    assert(toSpark("regexp_extract(s, '(a)(b)', 2)") ==
      "regexp_extract(s, '(a)(b)', 2)")
  }

  test("nested generate_subscripts/unnest zip hoists to one posexplode — executed") {
    // the q_embed_drift idiom: BOTH generators nested inside
    // expressions in one select list, zipped by DuckDB
    val t = toSpark(
      "SELECT CAST(generate_subscripts(CAST(l AS DOUBLE[]), 1) - 1 AS BIGINT) AS pos, " +
        "CAST(round(unnest(CAST(l AS DOUBLE[])) * 10) AS BIGINT) AS m " +
        "FROM (SELECT [0.1, 0.2, 0.7] AS l)")
    assert(t.contains("LATERAL VIEW posexplode"), s"no hoist in\n$t")
    val got = spark.sql(t).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (1L, 2L), (2L, 7L)), s"got $got via\n$t")
    // an expression-nested subscripts with NO matching unnest stays
    // put (and fails analysis loudly downstream, never silently zips)
    val lone = toSpark("SELECT generate_subscripts(a, 1) - 1 FROM t")
    assert(!lone.contains("LATERAL VIEW"), lone)
  }

  test("FLOAT/FLOAT division renders in single precision — executed") {
    // DuckDB computes and PRINTS float division in single precision;
    // Spark promotes to double, so the string cast must round back
    assert(run1("SELECT " + toSpark(
      "CAST(CAST(108 AS FLOAT) / CAST(255 AS FLOAT) AS VARCHAR)")) ==
      "0.42352942")
    // a double division's string cast is untouched
    assert(toSpark("CAST(a / b AS VARCHAR)") == "CAST(a / b AS STRING)")
  }

  test("HUGEINT statements floor-divide identifiers in decimal space — executed") {
    // sum-space value ≥ 2^63: `u // 2^k % 256` must extract the
    // UNSIGNED byte — the plain `div` (IntegralDivide → BIGINT)
    // wraps negative and extracts the signed residue
    val t = toSpark(
      "WITH x AS (SELECT CAST(9223372036854775808 AS HUGEINT) + 300 AS u) " +
        "SELECT CAST(u // 256 % 256 AS BIGINT) AS b FROM x")
    assert(run1(t) == ((java.math.BigInteger.TWO.pow(63)
      .add(java.math.BigInteger.valueOf(300))
      .divide(java.math.BigInteger.valueOf(256))
      .mod(java.math.BigInteger.valueOf(256))).longValue))
    // parenthesized integer `//` (UBIGINT grid space) keeps div
    assert(toSpark("(gx * 16) // 9").contains(" div "))
  }

  test("widenSums maps sum to DuckDB's HUGEINT aggregate typing") {
    assert(DuckDialect.toSpark("SELECT sum(x * y) AS s FROM t", widenSums = true) ==
      "SELECT sum(CAST(x * y AS DECIMAL(38,0))) AS s FROM t")
    // off by default
    assert(toSpark("SELECT sum(x) AS s FROM t") == "SELECT sum(x) AS s FROM t")
    // executed: the q_price_elasticity overflow shape survives widened
    val wide = DuckDialect.toSpark(
      "SELECT CAST(sum(x) * sum(x) AS DOUBLE) AS p " +
        "FROM (SELECT 4000000000 AS x UNION ALL SELECT 4000000000)",
      widenSums = true)
    assert(run1(wide) == 6.4e19)
  }
}
