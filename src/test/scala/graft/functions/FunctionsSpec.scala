package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.Schemas

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rolling_hash: codegen expression matches the reference fold") {
    RollingHash.register(spark)
    // h('abc') = ((0*31+97)*31+98)*31+99 mod 1e9+7 = 96354
    assert(spark.sql("SELECT rolling_hash('abc')").head.getLong(0) == 96354L)
    assert(spark.sql("SELECT rolling_hash('')").head.getLong(0) == 0L)
    assert(spark.sql("SELECT rolling_hash(cast(null AS string))").head.isNullAt(0))
  }

  test("rolling_hash rejects non-string input at analysis") {
    RollingHash.register(spark)
    intercept[Exception] { spark.sql("SELECT rolling_hash(42)").head }
  }

  test("TopK aggregator equals sort+limit") {
    import spark.implicits._
    val df = Seq((5.0, 1L), (9.0, 2L), (1.0, 3L), (9.0, 4L), (7.0, 5L))
      .toDF("score", "id")
    val topk = udaf(new TopK(3))
    val got = df.agg(topk(col("score"), col("id")).as("top"))
      .select(explode(col("top")))
      .select(col("col._1").as("score"), col("col._2").as("id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // ties broken by id asc: (9,2),(9,4),(7,5)
    assert(got == Seq((9.0, 2L), (9.0, 4L), (7.0, 5L)))
  }

  test("camelToSnake properties (scalacheck)") {
    val lower = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val camel = for {
      head <- lower
      tails <- Gen.listOf(for {
        c <- Gen.alphaUpperChar
        rest <- lower
      } yield s"$c$rest")
    } yield head + tails.mkString

    val idempotent = Prop.forAll(camel) { s =>
      val once = Schemas.camelToSnake(s)
      Schemas.camelToSnake(once) == once
    }
    val lowercase = Prop.forAll(camel) { s =>
      Schemas.camelToSnake(s).forall(c => c.isLower || c == '_')
    }
    val roundtripWords = Prop.forAll(camel) { s =>
      // underscore count equals number of uppercase humps
      Schemas.camelToSnake(s).count(_ == '_') == s.count(_.isUpper)
    }
    Seq(idempotent, lowercase, roundtripWords).foreach { p =>
      assert(SCTest.check(SCTest.Parameters.default, p).passed)
    }
  }
}
