package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class MinHashSigsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("expression kernel equals the explode+groupBy aggregation form on the corpus") {
    val docs = graft.tables.Tables.documents(spark, TestSpark.testdata("0.001"))
    val viaExpr = graft.ext.TextOps.minhashSigForTest(docs)
    val viaAgg = graft.ext.TextOps.minhashSigAgg(docs)
    assert(viaExpr.count() > 0)
    assert(viaExpr.count() == viaAgg.count())
    assert(viaExpr.except(viaAgg).count() == 0)
    assert(viaAgg.except(viaExpr).count() == 0)
  }

  test("simhash expression kernel equals the explode+groupBy form on the corpus") {
    val docs = graft.tables.Tables.documents(spark, TestSpark.testdata("0.001"))
    val viaExpr = graft.ext.TextOps.simhashSigForTest(docs)
    val viaAgg = graft.ext.TextOps.simhashSigAgg(docs)
    assert(viaExpr.count() > 0)
    assert(viaExpr.except(viaAgg).count() == 0)
    assert(viaAgg.except(viaExpr).count() == 0)
  }

  test("null/empty shingle arrays yield null signatures; null elements hash like concat_ws") {
    import spark.implicits._
    MinHashSigs.register(spark)
    val df = Seq(
      (1L, Seq("a b c", "b c d")),
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]])).toDF("id", "sh")
      .select(col("id"), expr("minhash_sigs(sh, 4)").as("sig"))
    val rows = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows == Map(1L -> false, 2L -> true, 3L -> true))
    val sig = df.filter(col("id") === 1).select(expr("size(sig)")).head().getInt(0)
    assert(sig == 4)

    // a NULL element degrades to the bare seed, exactly like the agg
    // form's md5(concat_ws('|', seed, NULL))
    val ok = spark.sql(
      """SELECT minhash_sigs(array('x', cast(NULL AS string)), 1)[0]
        |     = least(md5('0|x'), md5(concat_ws('|', '0', cast(NULL AS string))))""".stripMargin)
      .head().getBoolean(0)
    assert(ok)
  }
}
