package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared schemas + naming/parsing utilities for the reference-parity
  * ingestion path (SURVEY.md §1).
  *
  * The raw CSV schemas mirror the reference's shipped files
  * (`data/orders.csv:1`, `data/inventory.csv:1`); the canonical table
  * schemas mirror `models/tables.py:13–35`. Schemas are always declared —
  * never inferred — so types are stable at any scale and empty strings
  * land as NULL (pandas `NaN → None` parity, `flows/data_ingestion.py:
  * 109–112`).
  */
object Schemas {

  /** camelCase → snake_case, exactly the reference regex
    * (`flows/utils.py:4–5`): insert `_` between a lowercase char and the
    * following uppercase char, then lowercase everything.
    */
  def camelToSnake(s: String): String =
    "([a-z])([A-Z])".r.replaceAllIn(s, m => m.group(1) + "_" + m.group(2)).toLowerCase

  /** Dual-format ISO-8601 timestamp parse (`flows/data_ingestion.py:
    * 86–91`): the corpus mixes `2023-02-01T17:12:52Z` and seconds-less
    * `2023-02-01T06:16Z`. One CSV `timestampFormat` can't express both, so
    * the column is read as string and parsed with a format coalesce.
    * `try_to_timestamp` (not `to_timestamp`) because ANSI mode — Spark 4's
    * default — turns a format miss into a runtime error; unparseable
    * values become NULL instead.
    */
  def parseDateTime(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm'Z'")))

  /** Raw orders CSV schema — header names as shipped (camelCase);
    * `dateTime` stays string until [[parseDateTime]].
    */
  val ordersRaw: StructType = StructType(Seq(
    StructField("orderId", StringType),
    StructField("productId", StringType),
    StructField("currency", StringType),
    StructField("quantity", IntegerType),
    StructField("shippingCost", DoubleType),
    StructField("amount", DoubleType),
    StructField("channel", StringType),
    StructField("channelGroup", StringType),
    StructField("campaign", StringType),
    StructField("dateTime", StringType)))

  /** Raw inventory CSV schema. */
  val inventoryRaw: StructType = StructType(Seq(
    StructField("productId", StringType),
    StructField("name", StringType),
    StructField("quantity", IntegerType),
    StructField("category", StringType),
    StructField("subCategory", StringType)))

  /** Canonical `orders` table schema (`models/tables.py:13–25`, minus the
    * RDBMS surrogate `id`; see SURVEY.md §1.2 — logical keys suffice).
    */
  val orders: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("product_id", StringType),
    StructField("currency", StringType),
    StructField("quantity", IntegerType),
    StructField("shipping_cost", DoubleType),
    StructField("amount", DoubleType),
    StructField("channel", StringType),
    StructField("channel_group", StringType),
    StructField("campaign", StringType),
    StructField("date_time", TimestampType)))

  /** Canonical `inventories` table schema (`models/tables.py:28–35`). */
  val inventories: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("name", StringType),
    StructField("quantity", IntegerType),
    StructField("category", StringType),
    StructField("sub_category", StringType)))

  val ordersKey: Seq[String] = Seq("order_id", "product_id")
  val inventoriesKey: Seq[String] = Seq("product_id")
}
