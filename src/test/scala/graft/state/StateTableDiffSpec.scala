package graft.state

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class StateTableDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("version diff classifies inserts, updates, deletes, and null transitions") {
    val dir = Files.createTempDirectory("graft-diff").toString
    val t = new StateTable(spark, dir, keyCols = Seq("id"))

    t.overwrite(Seq(
      (1L, Some("a"), 10), (2L, Some("b"), 20), (3L, Some("c"), 30), (4L, None, 40))
      .toDF("id", "name", "qty").withColumn(StateTable.SeqCol, lit(0L)))
    val v1 = t.currentVersion.get

    t.overwrite(Seq(
      (1L, Some("a"), 10),         // unchanged -> no row
      (2L, Some("B"), 20),         // update
      (4L, Some("now-set"), 40),   // update: null -> value
      (5L, Option.empty[String], 50)) // insert with a null column
      .toDF("id", "name", "qty").withColumn(StateTable.SeqCol, lit(0L)))
    val v2 = t.currentVersion.get

    val got = t.diff(v1, v2)
      .as[(Long, Option[String], Int, String)].collect().toSet

    assert(got == Set(
      (2L, Some("B"), 20, "update"),
      (3L, Some("c"), 30, "delete"), // before-image carried
      (4L, Some("now-set"), 40, "update"),
      (5L, None, 50, "insert")))
  }

  test("diff tolerates no-_seq versions and a schema-evolution boundary") {
    val dir = Files.createTempDirectory("graft-diff3").toString
    val t = new StateTable(spark, dir, keyCols = Seq("id"))
    // bare overwrites (no _seq), second version gains a column
    t.overwrite(Seq((1L, 10), (2L, 20)).toDF("id", "qty"))
    val v1 = t.currentVersion.get
    t.overwrite(Seq((1L, 10, Some("fresh")), (2L, 20, Option.empty[String]))
      .toDF("id", "qty", "note"))
    val v2 = t.currentVersion.get

    val got = t.diff(v1, v2)
      .as[(Long, Int, Option[String], String)].collect().toSet
    // key 1 gains a non-null note -> update; key 2's note stays null -> unchanged
    assert(got == Set((1L, 10, Some("fresh"), "update")))
  }

  test("diff respects last-write-wins rows within a version") {
    val dir = Files.createTempDirectory("graft-diff2").toString
    val t = new StateTable(spark, dir, keyCols = Seq("id"))
    // duplicate key rows: _seq 1 wins within the version
    t.overwrite(Seq((1L, "old", 0L), (1L, "new", 1L))
      .toDF("id", "name", StateTable.SeqCol))
    val v1 = t.currentVersion.get
    t.overwrite(Seq((1L, "new", 0L)).toDF("id", "name", StateTable.SeqCol))
    val v2 = t.currentVersion.get

    // latest row ("new") is unchanged -> empty diff
    assert(t.diff(v1, v2).isEmpty)
  }
}
