package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.core.Schemas
import graft.ingest.Ingest
import graft.reports.Reports
import graft.state.StateTable

/** End-to-end parity against the reference's OWN shipped data
  * (orders.csv / inventory.csv under /root/reference/data, read-only).
  * Expected values are the
  * measured anchors from FIXTURES.md §3 / SURVEY.md §1.5 — the numbers
  * the reference pipeline itself produces. Skipped when the reference
  * checkout is absent.
  */
class ReferenceDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val ordersCsv = "/root/reference/data/orders.csv"
  private val inventoryCsv = "/root/reference/data/inventory.csv"
  private def available: Boolean =
    Files.exists(Paths.get(ordersCsv)) && Files.exists(Paths.get(inventoryCsv))

  test("reference orders.csv: 2,858 rows, 1,873 null campaigns, all timestamps parsed") {
    assume(available)
    val orders = Ingest.readOrdersCsv(spark, ordersCsv).cache()
    assert(orders.count() == 2858)
    assert(orders.filter(col("campaign").isNull).count() == 1873)
    // both ISO variants parse — including the 35 seconds-less rows
    assert(orders.filter(col("date_time").isNull).count() == 0)
    assert(orders.filter(col("currency") =!= "SEK").count() == 0)
  }

  test("reference inventory.csv: 1,135 rows, unique product ids, 3 categories") {
    assume(available)
    val inv = Ingest.readInventoriesCsv(spark, inventoryCsv).cache()
    assert(inv.count() == 1135)
    assert(inv.select("product_id").distinct().count() == 1135)
    assert(inv.select("category").distinct().count() == 3)
  }

  test("first ingest appends all 2,858 rows; re-run is row-count stable (§2.4)") {
    assume(available)
    val dir = Files.createTempDirectory("graft-ref-state").toString
    val t = new StateTable(spark, dir, Schemas.ordersKey)
    t.upsert(Ingest.readOrdersCsv(spark, ordersCsv))
    assert(t.current().get.count() == 2858) // 548 duplicate keys kept
    t.upsert(Ingest.readOrdersCsv(spark, ordersCsv))
    assert(t.current().get.count() == 2858) // stable under re-run
  }

  test("report 1 on reference data: 313 ordered products, inner join drops nothing") {
    assume(available)
    val orders = Ingest.readOrdersCsv(spark, ordersCsv)
    val inv = Ingest.readInventoriesCsv(spark, inventoryCsv)
    val rev = Reports.revenuePerProduct(orders, inv).cache()
    assert(rev.count() == 313)
    // join coverage: every ordered product exists in inventory
    assert(orders.select("product_id").distinct().count() == 313)
    val revs = rev.select("total_revenue").collect().map(_.getDouble(0))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("report 5 on reference data: unordered product yields NULL stock math") {
    assume(available)
    val orders = Ingest.readOrdersCsv(spark, ordersCsv)
    val inv = Ingest.readInventoriesCsv(spark, inventoryCsv).cache()
    // one of the 822 never-ordered products
    val unordered = inv.join(orders.select("product_id").distinct(), Seq("product_id"), "left_anti")
    assert(unordered.count() == 822)
    val pid = unordered.orderBy("product_id").select("product_id").head().getString(0)
    val status = Reports.inventoryStatus(orders, inv, pid).collect()
    assert(status.length == 1)
    assert(status.head.isNullAt(status.head.fieldIndex("total_sold")))
  }
}
