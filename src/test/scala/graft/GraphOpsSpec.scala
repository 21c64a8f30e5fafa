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

  test("empty graph: both reports are empty, not errors") {
    val none = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(GraphOps.edgeOverlap(none).count() == 0)
    assert(GraphOps.degreeHistogram(none).count() == 0)
  }
}
