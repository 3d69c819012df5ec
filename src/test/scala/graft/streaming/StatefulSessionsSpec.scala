package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class StatefulSessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flatMapGroupsWithState sessionization matches the batch sessionizer on closed sessions") {
    import spark.implicits._
    // replay corpus events as a stream
    val dir = Files.createTempDirectory("graft-sess-events").toString
    val batch = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batch.schema).parquet(dir)
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), col("value"))
      .as[StatefulSessions.Event]

    val q = StatefulSessions.sessionize(stream).toDF()
      .writeStream.format("memory").queryName("sessions_out").outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions_out")
    // batch twin: all sessions. The stream closes sessions on in-batch
    // gaps AND on event-time timeout once the watermark passes
    // session_end + gap — so everything except at most one trailing open
    // session per user is emitted, and nothing is invented.
    val expectAll = graft.ext.EventOps.q30Sessionize.run(spark, "/root/testdata/sf0.001")
    val users = expectAll.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(got.count() >= expectAll.count() - users)
    assert(got.count() <= expectAll.count())

    // spot-check: every emitted session matches a batch session (value
    // rounded — the incremental sum has a different fp association order
    // than the batch decimal sum)
    val g = got.select(col("user_id"), col("session_start"), col("session_end"),
      col("n_events"), round(col("total_value"), 6).as("v"))
    val e = expectAll.select(col("user_id"), col("session_start"), col("session_end"),
      col("n_events"), round(col("total_value"), 6).as("v"))
    assert(g.except(e).count() == 0)
  }
}
