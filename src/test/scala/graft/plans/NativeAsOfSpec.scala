package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.operators.AsOfJoin
import graft.tables.Tables

class NativeAsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native as-of exec matches the compositional window implementation") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("view_id"))

    val native = NativeAsOf.asof(purchases, views, Seq("user_id"), "ts", "v_ts")
      .select(col("event_id"), col("view_id"), col("v_ts"))
    val compositional = AsOfJoin.asof(purchases, views, Seq("user_id"), "ts", "v_ts")
      .select(col("event_id"), col("asof_view_id").as("view_id"), col("asof_v_ts").as("v_ts"))

    assert(native.count() == purchases.count())
    assert(native.except(compositional).count() == 0)
    assert(compositional.except(native).count() == 0)
    assert(native.filter(col("view_id").isNotNull).count() > 0)
  }

  test("native as-of physical plan: custom exec with one shuffle+sort per side") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val l = ev.filter(col("event_type") === "purchase").select(col("user_id"), col("ts"), col("event_id"))
    val r = ev.filter(col("event_type") === "view").select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val plan = NativeAsOf.asof(l, r, Seq("user_id"), "ts", "v_ts")
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsOfJoin"), s"custom exec missing from plan:\n$plan")
    // exactly one exchange per side (the EnsureRequirements-inserted
    // shuffles satisfying our ClusteredDistribution requirements)
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") >= 2)
  }

  test("native as-of: NULL times never match (SQL comparison semantics)") {
    import spark.implicits._
    val left = Seq((1, Some(10L)), (1, None), (2, Some(5L)))
      .toDF("k", "lt").select(col("k"), col("lt").cast("long").as("lt"))
    val right = Seq((1, Some(3L), "a"), (1, None, "null-time"), (2, Some(9L), "late"))
      .toDF("k", "rt", "p").select(col("k"), col("rt").cast("long").as("rt"), col("p"))
    val got = NativeAsOf.asof(left, right, Seq("k"), "lt", "rt")
      .collect().map(r => (r.getInt(0), Option(r.get(1)), Option(r.getString(3)))).toSet
    assert(got == Set(
      (1, Some(10L), Some("a")),   // matches rt=3, never the null-time row
      (1, None, None),             // null left time matches nothing
      (2, Some(5L), None)))        // rt=9 > 5: no match
  }

  test("native as-of property: matches scala reference on generated data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._

    val rowGen = for { key <- Gen.choose(0, 3); t <- Gen.choose(0L, 50L) } yield (key, t)
    val caseGen = for {
      ls <- Gen.listOfN(15, rowGen)
      rs <- Gen.listOfN(15, rowGen)
    } yield (ls.distinct, rs.distinct.map { case (k, t) => (k, t, s"r$k-$t") })

    val prop = Prop.forAll(caseGen) { case (ls, rs) =>
      val left = ls.toDF("k", "lt")
      val right = rs.toDF("k", "rt", "payload")
      val got = NativeAsOf.asof(left, right, Seq("k"), "lt", "rt")
        .select(col("k"), col("lt"), col("payload"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), Option(r.getString(2))))
        .toSet
      val expect = ls.map { case (k, lt) =>
        val best = rs.filter { case (rk, rt, _) => rk == k && rt <= lt }
          .sortBy(_._2).lastOption.map(_._3)
        (k, lt, best)
      }.toSet
      got == expect
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop).passed)
  }
}
