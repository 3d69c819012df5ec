package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-based validation of BOTH distributed connected-components
  * engines against an in-memory union-find oracle on random graphs. The
  * judged corpus (q46/q58) exercises one fixed, shallow pair set; random
  * sized/seeded graphs cover what it can't — deep paths (convergence
  * rounds), forests of singletons, duplicate/self-loop edges, and ids
  * that appear only in the edge list (conduits: they must carry
  * connectivity without ever becoming output labels).
  */
class ConnectedComponentsPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** label = min VERTEX id of each vertex's component; edge-only ids
    * conduct connectivity but are excluded from labels and output.
    */
  private def unionFind(vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    vertices.foreach(find)
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    val minVertexOfRoot = vertices.groupBy(find).map { case (r, vs) => r -> vs.min }
    vertices.map(v => v -> minVertexOfRoot(find(v))).toMap
  }

  private def run(
      impl: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame,
      vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val v = vertices.toDF("id")
    val e = edges.toDF("a", "b")
    val rows = impl(v, e, 50).as[(Long, Long)].collect()
    // toMap would silently collapse conflicting duplicate (id, label)
    // rows — exactly a bug class this spec exists to catch
    assert(rows.map(_._1).distinct.length == rows.length,
      s"duplicate per-vertex labels: ${rows.toSeq.sortBy(identity)}")
    rows.toMap
  }

  private def checkGraph(vertices: Seq[Long], edges: Seq[(Long, Long)]): Unit = {
    val expect = unionFind(vertices, edges)
    val minLabel = run(ConnectedComponents.components(_, _, _), vertices, edges)
    val altStar = run(ConnectedComponents.componentsAlternating(_, _, _), vertices, edges)
    assert(minLabel == expect, s"min-label CC != union-find on v=$vertices e=$edges")
    assert(altStar == expect, s"alternating CC != union-find on v=$vertices e=$edges")
  }

  test("deep path graph: both engines converge to the path minimum") {
    // worst case for plain label propagation (rounds ~ diameter)
    val n = 24L
    checkGraph(1L to n, (1L until n).map(i => (i, i + 1)))
  }

  test("edge-only conduit smaller than every vertex never becomes a label") {
    // vertices 5,7 joined through conduit 3: the component min VERTEX is
    // 5; a star engine that labels by raw component minimum would emit 3
    checkGraph(Seq(5L, 7L), Seq((5L, 3L), (3L, 7L)))
  }

  test("property: random graphs agree with union-find (both engines)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val graphGen = for {
      nv <- Gen.chooseNum(0, 18)
      ids <- Gen.pick(nv, 0L to 40L)
      ne <- Gen.chooseNum(0, 24)
      // endpoints drawn from a superset of the vertex ids: self-loops,
      // duplicates, and edge-only conduits all arise naturally
      edges <- Gen.listOfN(ne, Gen.zip(Gen.chooseNum(0L, 44L), Gen.chooseNum(0L, 44L)))
    } yield (ids.toSeq, edges)

    val prop = Prop.forAll(graphGen) { case (vertices, edges) =>
      checkGraph(vertices, edges); true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
