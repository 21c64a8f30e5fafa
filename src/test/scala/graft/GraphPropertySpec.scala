package graft

import scala.collection.mutable

import graft.operators.GraphOps

/** Property tests: the distributed graph operators against brute-force
  * in-memory references on seeded random graphs. The references are
  * deliberately naive (set algebra, fixpoint loops) — if the
  * distributed formulation and the naive one ever disagree, the
  * distributed one is wrong.
  */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomGraph(seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed * 7919 + 17)
    val n = 8 + rnd.nextInt(12)
    val p = 0.15 + rnd.nextDouble() * 0.25
    (for {
      x <- 0 until n; y <- (x + 1) until n
      if rnd.nextDouble() < p
    } yield (x.toLong, y.toLong)).toSeq
  }

  private def adjacency(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val m = mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    edges.foreach { case (x, y) => m(x) += y; m(y) += x }
    m.toMap
  }

  test("edgeOverlap equals set-algebra common/union on 12 random graphs") {
    for (seed <- 1 to 12) {
      val edges = randomGraph(seed)
      if (edges.nonEmpty) {
        val adj = adjacency(edges)
        val got = GraphOps.edgeOverlap(edges.toDF("x", "y"))
          .select("x", "y", "common_neighbors", "union_neighbors")
          .as[(Long, Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
        assert(got.size == edges.size, s"seed=$seed: row per edge")
        edges.foreach { case (x, y) =>
          val common = (adj(x) & adj(y)).size.toLong
          val union = ((adj(x) | adj(y)) - x - y).size.toLong
          assert(got((x, y)) == ((common, union)),
            s"seed=$seed edge=($x,$y): want ($common,$union) got ${got((x, y))}")
        }
      }
    }
  }

  test("kCorePinned with enough rounds equals the fixpoint peel on 12 random graphs") {
    for (seed <- 13 to 24; k <- Seq(2, 3)) {
      val edges = randomGraph(seed)
      if (edges.nonEmpty) {
        // naive fixpoint: repeatedly drop nodes with degree < k
        var adj = adjacency(edges)
        var changed = true
        while (changed) {
          val dead = adj.collect { case (n, nb) if nb.size < k => n }.toSet
          changed = dead.nonEmpty
          adj = (adj -- dead).map { case (n, nb) => n -> (nb -- dead) }
            .filter(_._2.nonEmpty)
        }
        val want = adj.map { case (n, nb) => n -> nb.size.toLong }
        val got = GraphOps.kCorePinned(edges.toDF("x", "y"), k, rounds = 10)
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"seed=$seed k=$k")
      }
    }
  }

  test("labelPropagationPinned equals the synchronous in-memory simulation on 12 random graphs") {
    for (seed <- 25 to 36) {
      val edges = randomGraph(seed)
      if (edges.nonEmpty) {
        val adj = adjacency(edges)
        var labels = adj.keys.map(n => n -> n).toMap
        for (_ <- 1 to 3) {
          labels = adj.map { case (n, nb) =>
            val counts = nb.toSeq.map(labels).groupBy(identity)
              .map { case (l, xs) => (l, xs.size) }
            val maxC = counts.values.max
            n -> counts.collect { case (l, c) if c == maxC => l }.min
          }
        }
        val got = GraphOps.labelPropagationPinned(edges.toDF("x", "y"), rounds = 3)
          .as[(Long, Long)].collect().toMap
        assert(got == labels, s"seed=$seed")
      }
    }
  }
}
