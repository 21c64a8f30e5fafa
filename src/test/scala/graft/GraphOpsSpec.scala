package graft

import org.apache.spark.sql.DataFrame

import graft.operators.GraphOps

/** Edge-overlap and degree-histogram semantics on a hand-checkable
  * bowtie-with-a-bridge graph:
  *
  *   1—2, 1—3, 2—3 (left triangle), 3—4, 3—5, 4—5 (right triangle),
  *   5—6 (a bridge to a pendant).
  *
  * Degrees: 1→2, 2→2, 3→4, 4→2, 5→3, 6→1.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bowtie: DataFrame =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L), (5L, 6L))
      .toDF("x", "y")

  test("edgeOverlap: in-clique edges score high, the bridge scores 0") {
    val out = GraphOps.edgeOverlap(bowtie)
      .select("x", "y", "common_neighbors", "union_neighbors", "jaccard")
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out.size == 7) // one row per edge, no duplicates
    // (1,2): common {3}, union {3} -> jaccard 1
    assert(out((1L, 2L)) == ((1L, 1L, Some(1.0))))
    // (2,3): common {1}, union {1,2's others ∪ 3's others} = {1,4,5}
    assert(out((2L, 3L)) == ((1L, 3L, Some(1.0 / 3.0))))
    // (3,5): common {4}, union {1,2,4,6} -> 1/4
    assert(out((3L, 5L)) == ((1L, 4L, Some(0.25))))
    // the bridge (5,6): no shared neighbors, union {3,4}
    assert(out((5L, 6L)) == ((0L, 2L, Some(0.0))))
  }

  test("edgeOverlap: an isolated edge has union 0 and NULL jaccard, not 0 or 1") {
    val lone = Seq((10L, 11L)).toDF("x", "y")
    val out = GraphOps.edgeOverlap(lone)
      .select("common_neighbors", "union_neighbors", "jaccard").collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 0L && out.head.getLong(1) == 0L)
    assert(out.head.isNullAt(2))
  }

  test("edgeOverlap agrees with triangleStats: edge commons sum to 3x triangle count") {
    val commonsSum = GraphOps.edgeOverlap(bowtie)
      .agg(org.apache.spark.sql.functions.sum("common_neighbors"))
      .as[Long].head()
    val triangleSum = GraphOps.triangleStats(bowtie)
      .agg(org.apache.spark.sql.functions.sum("n_triangles"))
      .as[Long].head()
    // each triangle contributes 1 to each of its 3 edges, and 1 to each
    // of its 3 nodes — the two reports count the same set
    assert(commonsSum == triangleSum)
    assert(commonsSum == 6L) // 2 triangles x 3 edges
  }

  test("degreeHistogram matches the hand count") {
    val out = GraphOps.degreeHistogram(bowtie)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 3L, 3L -> 1L, 4L -> 1L))
  }

  test("assortativity: a star is exactly -1, a clique has zero degree variance -> NULL") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("x", "y")
    val s = GraphOps.assortativity(star).head()
    // every directed edge pairs degree 4 with degree 1: the co-moment
    // algebra collapses to -k^2(k-1)^2 / k^2(k-1)^2 — exactly -1
    assert(s.getAs[Long]("n_directed_edges") == 8L)
    assert(s.getAs[Double]("assortativity") == -1.0)
    val clique = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("x", "y")
    val c = GraphOps.assortativity(clique).head()
    assert(c.isNullAt(c.fieldIndex("assortativity")))
  }

  test("labelPropagationPinned: disjoint triangles converge to per-component min labels") {
    val twoTriangles = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("x", "y")
    val got = GraphOps.labelPropagationPinned(twoTriangles, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("labelPropagationPinned: tie on neighbor counts resolves to the smallest label") {
    // node 5 sits between two equal-size camps labeled 1 and 9 after
    // round 1 bootstraps from ids; its round-2 pick must be the SMALLER
    val path = Seq((1L, 5L), (5L, 9L)).toDF("x", "y")
    val got = GraphOps.labelPropagationPinned(path, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // round 1: 1 -> 5, 9 -> 5, 5 -> min(1, 9) = 1
    // round 2: 5's neighbors both carry label 5 -> 5; 1 and 9 take 1
    assert(got(1L) == 1L && got(9L) == 1L && got(5L) == 5L)
  }

  test("kCorePinned: pendant chains peel away, the clique core survives with full degree") {
    // K4 on {1,2,3,4} plus a chain 4-5-6: 5 and 6 never reach degree 3
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("x", "y")
    val got = GraphOps.kCorePinned(g, k = 3, rounds = 4)
      .as[(Long, Long)].collect().toMap
    // after peel 1: 6 (deg 1) and 5 (deg 2) drop... 5's degree was 2 at
    // round 1 so both leave in two rounds; K4 keeps degree 3 throughout
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCorePinned: a cycle is its own 2-core; k=3 on a cycle empties it") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("x", "y")
    val core2 = GraphOps.kCorePinned(cycle, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    assert(GraphOps.kCorePinned(cycle, k = 3, rounds = 3).count() == 0)
  }

  test("empty graph: both reports are empty, not errors") {
    val none = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(GraphOps.edgeOverlap(none).count() == 0)
    assert(GraphOps.degreeHistogram(none).count() == 0)
  }
}
