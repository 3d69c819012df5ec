package graft.streaming

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the [[ReplayLock]] contract: BOTH streaming replay harnesses
  * ([[StreamingQueries.replayToSink]] behind q99, [[
  * StreamingWatermarkFunnel.replayTwoPhase]] behind q154) resize the
  * session-global `spark.sql.shuffle.partitions` for their streaming
  * jobs and restore it after — so concurrent replays must serialize on
  * ONE shared monitor or a replay-sized value can leak into the session
  * (the race fixed when the harnesses synchronized on their own
  * objects). The sequential driver mains never contend; this spec is
  * the only place the concurrent path is exercised, so a future
  * harness that synchronizes on the wrong lock fails here, not in a
  * nondeterministic production interleaving.
  */
class ReplayLockSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("concurrent replays across both harnesses restore the session conf") {
    val dir = "/root/testdata/sf0.001"
    val partsConf = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(partsConf)
    // Fresh tags would re-stage; the judged tags reuse each query's
    // shared staged slices, so this exercises exactly the judged paths.
    val a = Future(StreamingQueries.q99StreamingNearDup.run(spark, dir).count())
    val b = Future(StreamingQueries.q154WatermarkFunnel.run(spark, dir).count())
    val (na, nb) = Await.result(a.zip(b), 10.minutes)
    assert(na > 0 && nb > 0)
    assert(spark.conf.get(partsConf) === before,
      "a replay leaked its harness-sized shuffle-partition conf")
  }
}
