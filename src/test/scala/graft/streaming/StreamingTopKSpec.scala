package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.TestSpark

class StreamingTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed bounded top-k equals the batch window rank") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-topk-events").toString
    val batch = graft.tables.Tables.events(spark, TestSpark.testdata("0.001"))
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batch.schema).parquet(dir)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .as[StreamingTopK.Ev]

    val q = StreamingTopK.topK(stream, k = 5).toDF()
      .writeStream.format("memory").queryName("topk_out").outputMode("update")
      .start()
    q.processAllAvailable()
    q.stop()

    // latest emission per key (max per-key batch counter), exploded to
    // (event_type, value, event_id)
    val got = spark.table("topk_out")
      .groupBy(col("event_type"))
      .agg(max_by(col("top"), col("seq")).as("top"))
      .select(col("event_type"), explode(col("top")).as("t"))
      .select(col("event_type"), col("t.value"), col("t.event_id"))

    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    val expected = batch
      .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= 5)
      .select(col("event_type"), col("value"), col("event_id"))

    assert(got.count() == expected.count())
    assert(got.except(expected).count() == 0)
    assert(expected.except(got).count() == 0)
  }
}
