package graft.reports

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's six report queries (README.md:40–148) over the
  * ingested `orders` / `inventories` tables — the analytical surface the
  * reference outsources to Postgres, owned natively here.
  *
  * Inventory is dimension-sized → always broadcast; orders is the fact
  * side and streams. NULL propagation in [[inventoryStatus]] matches SQL
  * semantics exactly (no eager coalesce — SURVEY.md §7.5 risk 6).
  */
object Reports {

  /** 1. Total revenue per product (README.md:43–54). */
  def revenuePerProduct(orders: DataFrame, inventories: DataFrame): DataFrame =
    orders.join(broadcast(inventories.select(col("product_id"), col("name"))), Seq("product_id"))
      .groupBy(col("product_id"), col("name"))
      .agg(sum(col("quantity") * col("amount")).as("total_revenue"))
      .orderBy(col("total_revenue").desc)

  /** 2. Low stock (README.md:57–72). */
  def lowStock(inventories: DataFrame, threshold: Int = 10): DataFrame =
    inventories.filter(col("quantity") < threshold)
      .select(col("product_id"), col("name").as("product_name"),
        col("quantity").as("current_stock"), col("category"), col("sub_category"))
      .orderBy(col("current_stock").asc)

  /** 3. Orders per product per month (README.md:75–92). */
  def ordersPerMonth(orders: DataFrame, inventories: DataFrame): DataFrame =
    orders.join(broadcast(inventories.select(col("product_id"), col("name"))), Seq("product_id"))
      .groupBy(col("product_id"), col("name"),
        month(col("date_time")).as("month"), year(col("date_time")).as("year"))
      .agg(sum(col("quantity")).as("total_orders"))
      .orderBy(col("year").desc, col("month").desc, col("total_orders").desc)

  /** 4. Revenue per category (README.md:96–109). */
  def revenuePerCategory(orders: DataFrame, inventories: DataFrame): DataFrame =
    orders.join(broadcast(inventories.select(col("product_id"), col("category"))), Seq("product_id"))
      .groupBy(col("category"))
      .agg(sum(col("quantity") * col("amount")).as("total_revenue"))
      .orderBy(col("total_revenue").desc)

  /** 5. Inventory status for one product (README.md:112–130): LEFT JOIN,
    * NULL total_sold/remaining_stock when the product was never ordered.
    */
  def inventoryStatus(orders: DataFrame, inventories: DataFrame, productId: String): DataFrame =
    inventories.filter(col("product_id") === productId)
      .join(orders.select(col("product_id"), col("quantity").as("o_quantity")),
        Seq("product_id"), "left_outer")
      .groupBy(col("product_id"), col("name").as("product_name"), col("quantity"))
      .agg(sum(col("o_quantity")).as("total_sold"))
      .withColumn("remaining_stock", col("quantity") - col("total_sold"))
      .select(col("product_id"), col("product_name"),
        col("quantity").as("current_stock"), col("total_sold"), col("remaining_stock"))

  /** 6. Most sold per category (README.md:132–148) — global ORDER BY,
    * exactly as the reference declares it (not a per-group top-1).
    */
  def mostSoldPerCategory(orders: DataFrame, inventories: DataFrame): DataFrame =
    orders.join(broadcast(inventories.select(col("product_id"), col("category"), col("name"))), Seq("product_id"))
      .groupBy(col("category"), col("product_id"), col("name"))
      .agg(sum(col("quantity")).as("total_sold"))
      .orderBy(col("total_sold").desc)
}
