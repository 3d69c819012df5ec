package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("orders CSV: renamed columns, nulls, dual timestamps") {
    val df = Ingest.readOrdersCsv(spark, TestSpark.fixture("orders_fixture.csv")).cache()
    assert(df.columns.toSeq == Seq("order_id", "product_id", "currency", "quantity",
      "shipping_cost", "amount", "channel", "channel_group", "campaign", "date_time"))
    assert(df.count() == 6)
    // empty campaign -> NULL (3 rows in the fixture)
    assert(df.filter(col("campaign").isNull).count() == 3)
    // both timestamp variants parsed; nothing null
    assert(df.filter(col("date_time").isNull).count() == 0)
    val secondsLess = df.filter(col("order_id") === "ord-002").select("date_time").head().getTimestamp(0)
    assert(secondsLess.toInstant.toString == "2023-02-01T06:16:00Z")
  }

  test("inventory CSV: schema and count") {
    val df = Ingest.readInventoriesCsv(spark, TestSpark.fixture("inventory_fixture.csv"))
    assert(df.columns.toSeq == Seq("product_id", "name", "quantity", "category", "sub_category"))
    assert(df.count() == 6)
    assert(df.filter(col("quantity") < 10).count() == 3)
  }

  test("retry wrapper: recovers after transient failures, rethrows when exhausted") {
    var calls = 0
    val got = Retry.withRetries(attempts = 3, delayMillis = 1L) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"transient $calls")
      "ok"
    }
    assert(got == "ok" && calls == 3)

    var calls2 = 0
    val e = intercept[RuntimeException] {
      Retry.withRetries(attempts = 2, delayMillis = 1L) {
        calls2 += 1
        throw new RuntimeException(s"always $calls2")
      }
    }
    assert(e.getMessage == "always 2" && calls2 == 2)

    // non-matching failures are not retried
    var calls3 = 0
    intercept[IllegalStateException] {
      Retry.withRetries(attempts = 3, delayMillis = 1L,
        shouldRetry = _.getMessage.startsWith("transient")) {
        calls3 += 1
        throw new IllegalStateException("fatal")
      }
    }
    assert(calls3 == 1)
  }

  test("JSONL: declared schema, camelCase renames, corrupt rows preserved") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("docs.jsonl")
    java.nio.file.Files.writeString(f,
      """{"docId": 1, "text": "hello world", "sourceName": "web"}
        |{"docId": 2, "text": "second doc", "sourceName": "books"}
        |{not valid json at all
        |{"docId": 4, "text": null, "sourceName": "web"}
        |""".stripMargin)

    val schema = StructType(Seq(
      StructField("docId", LongType),
      StructField("text", StringType),
      StructField("sourceName", StringType)))
    // no cache(): the corrupt-record column must be directly queryable
    val df = Ingest.readJsonl(spark, f.toString, schema)

    assert(df.columns.toSeq == Seq("doc_id", "text", "source_name", "_corrupt_record"))
    assert(df.count() == 4)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("doc_id") === 4 && col("text").isNull).count() == 1)
    assert(df.filter(col("_corrupt_record").isNull).count() == 3)
  }
}
