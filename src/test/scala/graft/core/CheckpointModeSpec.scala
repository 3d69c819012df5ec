package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.ConnectedComponents

/** `Checkpoints.pin` has two modes — executor-local (default) and
  * reliable-directory (`spark.graft.checkpointDir`, the fault-tolerance
  * path for multi-hour 100 TB runs). The iterative operators' results
  * must be bit-identical across modes: pinning is a lineage concern,
  * never a semantic one.
  */
class CheckpointModeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withReliableDir[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try body
    finally spark.conf.unset(Checkpoints.DirConf)
  }

  test("reliable mode writes checkpoint files under the configured dir") {
    withReliableDir {
      val pinned = Checkpoints.pin(Seq(1L, 2L, 3L).toDF("id"))
      assert(pinned.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
      val dir = new java.io.File(
        spark.sparkContext.getCheckpointDir.get.stripPrefix("file:"))
      assert(dir.exists && dir.listFiles.nonEmpty,
        s"no checkpoint data under $dir")
    }
  }

  test("connected components are identical in local and reliable modes") {
    // chain + clique + singleton: exercises multi-round propagation in
    // both engines
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L)).toDF("a", "b")

    val local = ConnectedComponents.components(vertices, edges)
      .as[(Long, Long)].collect().toMap
    val localStars = ConnectedComponents.componentsAlternating(vertices, edges)
      .as[(Long, Long)].collect().toMap
    val (reliable, reliableStars) = withReliableDir {
      (ConnectedComponents.components(vertices, edges)
        .as[(Long, Long)].collect().toMap,
        ConnectedComponents.componentsAlternating(vertices, edges)
          .as[(Long, Long)].collect().toMap)
    }

    assert(reliable == local)
    assert(reliableStars == localStars)
  }

  test("q91 pagerank is identical in local and reliable modes") {
    val dir = TestSpark.testdata("0.001")
    val q = graft.ext.TextOps.q91PageRank
    def run(): Seq[org.apache.spark.sql.Row] =
      q.run(spark, dir).collect().toSeq
    val local = run()
    val reliable = withReliableDir(run())
    assert(reliable == local)
  }
}
