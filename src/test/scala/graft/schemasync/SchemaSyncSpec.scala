package graft.schemasync

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.types._

import graft.TestSpark
import graft.core.Schemas
import graft.ingest.Ingest
import graft.state.StateTable
import SchemaSync._

class SchemaSyncSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val v1 = StructType(Seq(
    StructField("product_id", StringType),
    StructField("name", StringType),
    StructField("quantity", IntegerType)))

  test("diff: missing table -> CreateTable") {
    assert(diff(v1, None) == Seq(CreateTable(v1)))
  }

  test("diff: added + dropped columns, protected columns survive") {
    val physical = StructType(Seq(
      StructField("product_id", StringType),
      StructField("name", StringType),
      StructField("legacy_col", StringType)))
    val changes = diff(v1, Some(physical), protectedCols = Set("product_id"))
    assert(changes.contains(AddColumn(StructField("quantity", IntegerType))))
    assert(changes.contains(DropColumn("legacy_col")))
    assert(!changes.exists { case DropColumn("product_id") => true; case _ => false })
  }

  test("diff: in-sync schema -> no changes") {
    assert(diff(v1, Some(v1)).isEmpty)
  }

  test("sync applies add/drop on a live state table (evolve-then-read)") {
    val dir = Files.createTempDirectory("graft-sync").toString
    val t = new StateTable(spark, dir, Seq("product_id"))
    t.upsert(Ingest.readInventoriesCsv(spark, TestSpark.fixture("inventory_fixture.csv")))

    // v2 declares a new nullable column and drops sub_category
    val v2 = StructType(Seq(
      StructField("product_id", StringType),
      StructField("name", StringType),
      StructField("quantity", IntegerType),
      StructField("category", StringType),
      StructField("supplier_code", StringType)))
    val changes = SchemaSync.sync(spark, t, v2, protectedCols = Set("product_id"))
    assert(changes.toSet == Set(
      AddColumn(StructField("supplier_code", StringType)),
      DropColumn("sub_category")))

    val cur = t.current().get
    assert(cur.columns.toSet == v2.fieldNames.toSet)
    assert(cur.filter(cur("supplier_code").isNotNull).count() == 0)
    assert(cur.count() == 6)

    // idempotent second sync
    assert(SchemaSync.sync(spark, t, v2, protectedCols = Set("product_id")).isEmpty)
  }

  test("evolve-then-ingest: upsert of a batch lacking a synced-in column") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    val t = new StateTable(spark, dir, Seq("product_id"))
    t.upsert(Ingest.readInventoriesCsv(spark, TestSpark.fixture("inventory_fixture.csv")))
    // declare a new column the CSV doesn't carry, sync, then re-ingest
    val v2 = StructType(Schemas.inventories.fields :+ StructField("supplier_code", StringType))
    SchemaSync.sync(spark, t, v2, protectedCols = Set("product_id"))
    t.upsert(Ingest.readInventoriesCsv(spark, TestSpark.fixture("inventory_fixture.csv")))
    val cur = t.current().get
    assert(cur.count() == 6)
    assert(cur.columns.contains("supplier_code"))
    assert(cur.filter(cur("supplier_code").isNotNull).count() == 0)
  }

  test("sync creates an empty table when absent") {
    val dir = Files.createTempDirectory("graft-sync2").toString
    val t = new StateTable(spark, dir, Seq("product_id"))
    val changes = SchemaSync.sync(spark, t, Schemas.inventories)
    assert(changes == Seq(CreateTable(Schemas.inventories)))
    assert(t.current().get.count() == 0)
    assert(t.current().get.columns.toSet == Schemas.inventories.fieldNames.toSet)
  }
}
