package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("labels chains, cliques and singletons with the component minimum") {
    // component {1,2,3,4} as a chain (needs >1 propagation round),
    // component {10,11}, singleton {20}
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")

    val got = ConnectedComponents.components(vertices, edges)
      .as[(Long, Long)].collect().toMap

    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("null edge endpoints are dropped, not propagated") {
    val vertices = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((Some(1L), Some(2L)), (Some(3L), None), (None, Some(2L)))
      .toDF("a", "b")

    val got = ConnectedComponents.components(vertices, edges)
      .as[(Long, Long)].collect().toMap

    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("alternating large/small-star matches label propagation on a random graph") {
    // deterministic pseudo-random graph: 60 vertices, edges from an LCG
    val n = 60
    val vertices = (0 until n).map(_.toLong).toDF("id")
    val lcg = Iterator.iterate(12345L)(x => (x * 1103515245L + 12345L) & 0x7fffffffL)
    val edges = lcg.take(80).grouped(2).collect { case Seq(x, y) => (x % n, y % n) }
      .filter { case (a, b) => a != b }.toSeq.toDF("a", "b")

    val viaLabels = ConnectedComponents.components(vertices, edges)
      .as[(Long, Long)].collect().toMap
    val viaStars = ConnectedComponents.componentsAlternating(vertices, edges)
      .as[(Long, Long)].collect().toMap

    assert(viaStars == viaLabels)
  }

  test("alternating variant handles a deep path, singletons and null endpoints") {
    val vertices = (0L to 25L).toDF("id")
    // path 0..19 (depth 19), pair {21,22}, singletons 20/23/24/25, null edge
    val edges = ((0 until 19).map(i => (Some(i.toLong), Some(i.toLong + 1)))
      ++ Seq((Some(21L), Some(22L)), (Some(23L), None))).toDF("a", "b")

    val got = ConnectedComponents.componentsAlternating(vertices, edges)
      .as[(Long, Long)].collect().toMap

    val expected = ((0 to 19).map(_.toLong -> 0L)
      ++ Seq(20L -> 20L, 21L -> 21L, 22L -> 21L, 23L -> 23L, 24L -> 24L, 25L -> 25L)).toMap
    assert(got == expected)
  }

  test("both variants restrict output to the declared vertex domain") {
    // id 5 appears only in an edge: it conducts connectivity (1-5-2) but
    // is not returned by either variant
    val vertices = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 5L), (5L, 2L)).toDF("a", "b")

    val viaLabels = ConnectedComponents.components(vertices, edges)
      .as[(Long, Long)].collect().toMap
    val viaStars = ConnectedComponents.componentsAlternating(vertices, edges)
      .as[(Long, Long)].collect().toMap

    assert(viaLabels == Map(1L -> 1L, 2L -> 1L))
    assert(viaStars == viaLabels)
  }

  test("non-convergence within maxIter fails loudly instead of returning wrong labels") {
    val vertices = (0L to 10L).toDF("id")
    val edges = (0 until 10).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    assertThrows[IllegalStateException] {
      ConnectedComponents.components(vertices, edges, maxIter = 3).collect()
    }
  }

  test("long path converges within maxIter via min-label propagation") {
    // path 0-1-2-...-19: worst case for label propagation (19 hops)
    val n = 20
    val vertices = (0 until n).map(_.toLong).toDF("id")
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")

    val got = ConnectedComponents.components(vertices, edges)
      .agg(countDistinct(col("label")), min(col("label")))
      .as[(Long, Long)].head()

    assert(got == ((1L, 0L)))
  }
}
