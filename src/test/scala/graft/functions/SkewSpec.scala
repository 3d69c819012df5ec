package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.tables.Tables

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join equals plain join") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).select(col("p_partkey").as("l_partkey"), col("p_name"))

    val plain = li.join(p, Seq("l_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("p_name"))
    val salted = Skew.saltedJoin(li, p, Seq("l_partkey"), salt = 8,
        bigRowId = col("l_orderkey") * 10 + col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("p_name"))

    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("extensions-registered rolling_hash works without manual register") {
    // TestSpark session is built withExtensions(GraftExtensions)
    assert(spark.sql("SELECT rolling_hash('abc')").head().getLong(0) == 96354L)
  }
}
