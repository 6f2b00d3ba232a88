package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** Min-label propagation semantics on hand-built graphs. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.clusters(
        nodes.toDF("id"), edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pairs, chains, and singletons resolve to min-id components") {
    // components: {1,2} {3,4,5 via chain} {6} {7,8 via 8-7}
    val got = run(1L to 8L, Seq((1L, 2L), (3L, 4L), (4L, 5L), (8L, 7L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 3L,
      6L -> 6L, 7L -> 7L, 8L -> 7L))
  }

  test("long chain needs multiple propagation rounds (diameter > 2)") {
    val chain = (1L until 10L).map(i => (i, i + 1))
    val got = run(1L to 10L, chain)
    assert(got.values.toSet == Set(1L), "whole chain collapses to min node")
  }

  test("cycle converges") {
    val got = run(1L to 3L, Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(got.values.toSet == Set(1L))
  }

  test("empty edge set leaves every node its own cluster") {
    val got = run(1L to 4L, Seq.empty)
    assert(got == (1L to 4L).map(i => i -> i).toMap)
  }
}
