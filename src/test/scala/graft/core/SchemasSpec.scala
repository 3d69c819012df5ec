package graft.core

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class SchemasSpec extends AnyFunSuite {

  test("camelToSnake matches the reference renames exactly") {
    val expected = Map(
      "orderId" -> "order_id", "productId" -> "product_id",
      "currency" -> "currency", "quantity" -> "quantity",
      "shippingCost" -> "shipping_cost", "amount" -> "amount",
      "channel" -> "channel", "channelGroup" -> "channel_group",
      "campaign" -> "campaign", "dateTime" -> "date_time",
      "name" -> "name", "category" -> "category",
      "subCategory" -> "sub_category")
    expected.foreach { case (in, out) =>
      assert(Schemas.camelToSnake(in) == out, s"for $in")
    }
  }

  test("camelToSnake is idempotent on already-snake names") {
    Schemas.orders.fieldNames.foreach { n =>
      assert(Schemas.camelToSnake(n) == n)
    }
  }

  test("dual-format timestamp parse handles both ISO variants") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("2023-02-01T17:12:52Z", "2023-02-01T06:16Z", "garbage")
      .toDF("raw")
      .select(Schemas.parseDateTime(col("raw")).as("ts"))
    val rows = df.collect()
    assert(rows(0).getTimestamp(0).toInstant.toString == "2023-02-01T17:12:52Z")
    assert(rows(1).getTimestamp(0).toInstant.toString == "2023-02-01T06:16:00Z")
    assert(rows(2).isNullAt(0))
  }
}
