package graft.state
// (diff/CDC tests live in StateTableDiffSpec)

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Schemas
import graft.ingest.Ingest

class TimeTravelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("versions are immutable and readable (time travel)") {
    val dir = Files.createTempDirectory("graft-tt").toString
    val t = new StateTable(spark, dir, Schemas.ordersKey)
    t.upsert(Ingest.readOrdersCsv(spark, TestSpark.fixture("orders_fixture.csv")))
    val v1 = t.currentVersion.get
    t.upsert(Ingest.readOrdersCsv(spark, TestSpark.fixture("orders_rerun.csv")))
    val v2 = t.currentVersion.get

    assert(t.history() == Seq(v1, v2))
    assert(t.readVersion(v1).count() == 6) // pre-rerun snapshot intact
    assert(t.readVersion(v2).count() == 8)
    assert(t.current().get.count() == 8)
  }
}
