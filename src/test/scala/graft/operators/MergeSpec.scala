package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def state = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "name", "qty")

  test("update-all + insert-all (classic upsert)") {
    val batch = Seq((2L, "B", 200), (4L, "d", 40)).toDF("id", "name", "qty")
    val got = Merge.into(state, batch).on("id")
      .whenMatchedUpdate()
      .whenNotMatchedInsert()
      .execute()
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 10), (2L, "B", 200), (3L, "c", 30), (4L, "d", 40)))
  }

  test("conditional update leaves non-qualifying matches untouched") {
    val batch = Seq((1L, "A", 5), (2L, "B", 200)).toDF("id", "name", "qty")
    val got = Merge.into(state, batch).on("id")
      .whenMatchedUpdate(Some(expr("s.qty > t.qty"))) // only 2 qualifies
      .whenNotMatchedInsert()
      .execute()
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 10), (2L, "B", 200), (3L, "c", 30)))
  }

  test("delete clause wins over a later update clause (first-match order)") {
    val batch = Seq((1L, "x", 0), (2L, "B", 200)).toDF("id", "name", "qty")
    val got = Merge.into(state, batch).on("id")
      .whenMatchedDelete(Some(expr("s.qty = 0")))
      .whenMatchedUpdate()
      .whenNotMatchedInsert()
      .execute()
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((2L, "B", 200), (3L, "c", 30)))
  }

  test("partial-column update with expressions over both sides") {
    val batch = Seq((1L, "ignored", 7)).toDF("id", "name", "qty")
    val got = Merge.into(state, batch).on("id")
      .whenMatchedUpdate(None, Map("qty" -> expr("t.qty + s.qty")))
      .execute()
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 17), (2L, "b", 20), (3L, "c", 30)))
  }

  test("conditional insert drops non-qualifying source rows") {
    val batch = Seq((4L, "d", 40), (5L, "e", -1)).toDF("id", "name", "qty")
    val got = Merge.into(state, batch).on("id")
      .whenNotMatchedInsert(Some(expr("s.qty >= 0")))
      .execute()
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40)))
  }

  test("property: upsert-merge is idempotent and empty-source is identity") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val row = for {
      id <- Gen.chooseNum(0L, 20L)
      nm <- Gen.oneOf("a", "b", "c")
      q <- Gen.chooseNum(0, 100)
    } yield (id, nm, q)
    // key-unique batches (ambiguous merges are rejected by contract)
    val batchGen = Gen.listOf(row).map(_.distinctBy(_._1))

    val prop = Prop.forAll(batchGen) { rows =>
      val batch = rows.toDF("id", "name", "qty")
      def merge(t: org.apache.spark.sql.DataFrame) =
        Merge.into(t, batch).on("id").whenMatchedUpdate().whenNotMatchedInsert().execute()
      val once = merge(state).as[(Long, String, Int)].collect().toSet
      val twice = merge(merge(state)).as[(Long, String, Int)].collect().toSet
      val identity = Merge.into(state, spark.emptyDataset[(Long, String, Int)].toDF("id", "name", "qty"))
        .on("id").whenMatchedUpdate().whenNotMatchedInsert().execute()
        .as[(Long, String, Int)].collect().toSet
      once == twice && identity == state.as[(Long, String, Int)].collect().toSet
    }
    val res = check(Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("updateAll touches only the shared columns when target has extras") {
    val widened = state.withColumn("note", lit("keep-me"))
    val batch = Seq((2L, "B", 200)).toDF("id", "name", "qty")
    val got = Merge.into(widened, batch).on("id")
      .whenMatchedUpdate()
      .execute()
      .as[(Long, String, Int, String)].collect().toSet
    assert(got == Set((1L, "a", 10, "keep-me"), (2L, "B", 200, "keep-me"), (3L, "c", 30, "keep-me")))
  }

  test("reserved internal column names are rejected up front") {
    val bad = state.withColumn("_action", lit(1))
    val batch = Seq((2L, "B", 200)).toDF("id", "name", "qty")
    assertThrows[IllegalArgumentException] {
      Merge.into(bad, batch).on("id").whenMatchedUpdate().execute()
    }
  }

  test("duplicate source keys are rejected, not silently multiplied") {
    val batch = Seq((2L, "B", 200), (2L, "BB", 201)).toDF("id", "name", "qty")
    assertThrows[IllegalStateException] {
      Merge.into(state, batch).on("id").whenMatchedUpdate().execute().collect()
    }
  }
}
