package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** Min-label propagation semantics on hand-built graphs. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runBoth(nodes: Seq[Long], edges: Seq[(Long, Long)]): Seq[Map[Long, Long]] = {
    import spark.implicits._
    val (n, e) = (nodes.toDF("id"), edges.toDF("a", "b"))
    Seq(
      ConnectedComponents.clustersUnionFind(n, e),
      ConnectedComponents.clustersPropagate(n, e, maxIter = 25))
      .map(_.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("pairs, chains, and singletons resolve to min-id components (both paths agree)") {
    // components: {1,2} {3,4,5 via chain} {6} {7,8 via 8-7}
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 3L,
      6L -> 6L, 7L -> 7L, 8L -> 7L)
    runBoth(1L to 8L, Seq((1L, 2L), (3L, 4L), (4L, 5L), (8L, 7L)))
      .foreach(got => assert(got == expected))
  }

  test("long chain needs multiple propagation rounds (diameter > 2)") {
    val chain = (1L until 10L).map(i => (i, i + 1))
    runBoth(1L to 10L, chain)
      .foreach(got => assert(got.values.toSet == Set(1L), "whole chain collapses to min node"))
  }

  test("cycle converges") {
    runBoth(1L to 3L, Seq((1L, 2L), (2L, 3L), (3L, 1L)))
      .foreach(got => assert(got.values.toSet == Set(1L)))
  }

  test("empty edge set leaves every node its own cluster") {
    runBoth(1L to 4L, Seq.empty[(Long, Long)])
      .foreach(got => assert(got == (1L to 4L).map(i => i -> i).toMap))
  }

  test("random graphs: union-find, propagation, and BFS reference all agree") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val n = 30
      val edges = (1 to 25).map(_ => (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter { case (a, b) => a != b }
      // BFS reference on the driver
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def component(start: Long): Set[Long] = {
        var seen = Set(start); var frontier = Set(start)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(x => adj.getOrElse(x, Set.empty)) -- seen
          seen ++= frontier
        }
        seen
      }
      val expected = (1L to n).map(i => i -> component(i).min).toMap
      runBoth(1L to n, edges).foreach(got => assert(got == expected))
    }
  }

  test("incremental(prior, batch) equals full recompute on random graphs at several split points") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4; split <- Seq(10L, 15L, 20L)) {
      val n = 30L
      // old-old edges only below the split (the unchanged-corpus
      // contract), plus new-new and new-old edges — chains through new
      // nodes can merge two PRIOR components transitively
      val edges = (1 to 40).map(_ => (rnd.nextLong(n) + 1, rnd.nextLong(n) + 1))
        .filter { case (a, b) => a != b }.distinct
      val corpusEdges = edges.filter { case (a, b) => a < split && b < split }
      val newEdges = edges.filter { case (a, b) => a >= split || b >= split }
      val corpusNodes = (1L until split).toDF("id")
      val newNodes = (split to n).toDF("id")
      val prior = ConnectedComponents.clusters(corpusNodes, corpusEdges.toDF("a", "b"))
      val got = ConnectedComponents
        .incremental(prior, newNodes, newEdges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = ConnectedComponents
        .clusters((1L to n).toDF("id"), edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == full, s"trial $trial split $split:\n" +
        s"diff=${(got.toSet diff full.toSet).take(5)} / ${(full.toSet diff got.toSet).take(5)}")
    }
  }

  test("public clusters() dispatches by edge count and matches the paths") {
    import spark.implicits._
    val n = (1L to 6L).toDF("id")
    val e = Seq((1L, 2L), (5L, 6L)).toDF("a", "b")
    val got = ConnectedComponents.clusters(n, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }
}
