package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Batch-parity spec for the streaming funnel — deliberately NOT a judged
  * query like q66. The funnel state machine is order-SENSITIVE: a user's
  * stage depends on the order events arrive, and the file-source replay
  * guarantees order only WITHIN a micro-batch, not across file listing
  * order. Promoting it to the oracle gate would make the result depend on
  * scheduler behavior. q66's bounded top-k qualifies because it is a
  * semilattice merge (max-k of a union — batch-boundary- and
  * order-independent); the funnel does not. Here the whole table is one
  * file ⇒ one micro-batch ⇒ in-batch ts sort is total, so parity holds.
  */
class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming funnel stages reproduce the batch q50 reach counts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-funnel-events").toString
    val batch = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batch.schema).parquet(dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[StreamingFunnel.Ev]

    val q = StreamingFunnel.funnel(stream).toDF()
      .writeStream.format("memory").queryName("funnel_out").outputMode("update")
      .start()
    q.processAllAvailable()
    q.stop()

    // latest stage per user (update mode re-emits on later triggers)
    val stages = spark.table("funnel_out")
      .groupBy(col("user_id")).agg(max(col("stage")).as("stage"))
    val reach = stages.agg(
      sum(when(col("stage") >= 1, 1L).otherwise(0L)).as("n_view"),
      sum(when(col("stage") >= 2, 1L).otherwise(0L)).as("n_click"),
      sum(when(col("stage") >= 3, 1L).otherwise(0L)).as("n_purchase"))
      .as[(Long, Long, Long)].head()

    val expected = graft.ext.EventOps.q50Funnel.run(spark, "/root/testdata/sf0.001")
      .select(col("n_view"), col("n_click"), col("n_purchase"))
      .as[(Long, Long, Long)].head()

    assert(reach == expected)
    assert(reach._1 > 0L)
  }
}
