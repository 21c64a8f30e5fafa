package graft

import graft.operators.GraphOps
import graft.sources.{Derived, Tables}

/** The session-scoped shared-derivation cache: one build per
  * (session, dir), content identical to a direct derivation, and the
  * rebuild path replaces the cached handle (the ingest-time refresh).
  */
class DerivedSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("itemEdgeSupports is derived once per (session, dir) and reused") {
    Derived.clear()
    val first = Derived.itemEdgeSupports(spark, sfDir)
    val second = Derived.itemEdgeSupports(spark, sfDir)
    assert(first eq second, "second call must return the cached handle")
  }

  test("cached edges equal a direct GraphOps.itemEdges derivation") {
    val cached = Derived.itemEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = GraphOps.itemEdges(
        Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey", minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cached == direct)
    assert(cached.nonEmpty, "sf0.001 must produce a non-trivial edge list")
    assert(cached.forall { case (x, y) => x < y }, "edges are canonical x < y")
  }

  test("itemEdgesRebuilt replaces the cached support table with a fresh build") {
    val before = Derived.itemEdgeSupports(spark, sfDir)
    Derived.itemEdgesRebuilt(spark, sfDir)
    val after = Derived.itemEdgeSupports(spark, sfDir)
    assert(!(after eq before), "rebuild must replace the cached table")
  }

  test("different dirs never alias in the cache") {
    Derived.clear()
    val a = Derived.itemEdgeSupports(spark, sfDir)
    val b = Derived.itemEdgeSupports(spark, "/root/testdata/sf0.01")
    assert(!(a eq b))
  }

  test("foldItemEdgeSupports over a new batch equals a full recompute over the union") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val offset = li.agg(max(col("l_orderkey")) + 1).head().getLong(0)
    val newBatch = li.filter(col("l_orderkey") % 10 === 0)
      .withColumn("l_orderkey", col("l_orderkey") + lit(offset))
    val folded = graft.operators.GraphOps.foldItemEdgeSupports(
        Derived.itemEdgeSupports(spark, sfDir), newBatch, "l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = graft.operators.GraphOps.itemEdgeSupports(
        li.unionByName(newBatch), "l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(folded == full)
    // the batch genuinely promotes pairs across the >= 2 threshold
    val promoted = full.count { case (k, v) => v >= 2 } -
      Derived.itemEdgeSupports(spark, sfDir)
        .filter(col("support") >= 2).count().toInt
    assert(promoted > 0, "fixture must exercise threshold promotion")
  }

  test("dedup stage tables: cached reuse, rebuild replacement, and cascade containment") {
    Derived.clear()
    val st1 = Derived.dedupStages(spark, sfDir)
    val st2 = Derived.dedupStages(spark, sfDir)
    assert(st1.exactKept eq st2.exactKept)
    assert(st1.nearKeepers eq st2.nearKeepers)
    assert(st1.semKeepers eq st2.semKeepers)
    val rebuilt = Derived.dedupStagesRebuilt(spark, sfDir)
    assert(!(rebuilt.exactKept eq st1.exactKept))
    assert(Derived.dedupStages(spark, sfDir).exactKept eq rebuilt.exactKept)
    // each stage keeps a subset of the previous one
    val exactIds = rebuilt.exactKept.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val nearIds = rebuilt.nearKeepers.collect().map(_.getLong(0)).toSet
    val semIds = rebuilt.semKeepers.collect().map(_.getLong(0)).toSet
    assert(nearIds.subsetOf(exactIds))
    assert(semIds.subsetOf(nearIds))
    assert(exactIds.nonEmpty && nearIds.nonEmpty)
  }

  test("minhash store: standing labels equal an in-query CC over the corpus pairs") {
    Derived.clear()
    val store = Derived.minhashStore(spark, sfDir)
    assert(Derived.minhashStore(spark, sfDir).standing eq store.standing)
    val pairs = graft.functions.TextOps.minhashCandidatePairs(
      graft.sources.Tables.documents(spark, sfDir), "doc_id", "text",
      bands = 4, rowsPerBand = 2, shingleSize = 3)
    val direct = graft.operators.DedupGroups.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stored = store.standing
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored == direct)
    val rebuilt = Derived.minhashStoreRebuilt(spark, sfDir)
    assert(!(rebuilt.standing eq store.standing))
    assert(Derived.minhashStore(spark, sfDir).standing eq rebuilt.standing)
  }
}
