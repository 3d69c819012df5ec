package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.tables.Tables

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asof join equals brute-force inequality join + row_number") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_event_id"))

    val got = AsOfJoin.asof(purchases, views, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("asof_view_event_id"))

    // brute force: all (purchase, prior view) pairs, keep latest view
    val viewsR = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("view_event_id"))
    val w = Window.partitionBy(col("event_id")).orderBy(col("v_ts").desc)
    val brute = purchases
      .join(viewsR, col("user_id") === col("v_user") && col("v_ts") <= col("ts"), "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("view_event_id").as("asof_view_event_id"))

    assert(got.count() == purchases.count())
    assert(brute.count() == purchases.count())
    assert(got.except(brute).count() == 0)
    assert(brute.except(got).count() == 0)
    // sanity: a decent share of purchases actually have a prior view
    assert(got.filter(col("asof_view_event_id").isNotNull).count() > 0)
  }

  test("asof join property: matches scala-reference semantics on generated data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._

    val rowGen = for {
      key <- Gen.choose(0, 3)
      t <- Gen.choose(0L, 50L)
    } yield (key, t)
    // left/right sets of (key, time); times unique per side via distinct
    val caseGen = for {
      ls <- Gen.listOfN(15, rowGen)
      rs <- Gen.listOfN(15, rowGen)
    } yield (ls.distinct, rs.distinct.map { case (k, t) => (k, t, s"r$k-$t") })

    val prop = Prop.forAll(caseGen) { case (ls, rs) =>
      val left = ls.toDF("k", "lt")
      val right = rs.toDF("k", "rt", "payload")
      val got = AsOfJoin.asof(left, right, Seq("k"), "lt", "rt")
        .select(col("k"), col("lt"), col("asof_payload"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), Option(r.getString(2))))
        .toSet
      // scala reference: latest right with rt <= lt per key (unique rt per
      // (k, rt) after distinct, so the max is unambiguous)
      val expect = ls.map { case (k, lt) =>
        val best = rs.filter { case (rk, rt, _) => rk == k && rt <= lt }
          .sortBy(_._2).lastOption.map(_._3)
        (k, lt, best)
      }.toSet
      got == expect
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop).passed)
  }
}
