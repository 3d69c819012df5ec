package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.tables.Tables

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("forward asof equals brute-force next-event join") {
    val ev = Tables.events(spark, graft.TestSpark.testdata("0.001"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"))

    val got = AsOfJoin.asofForward(views, purchases, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("asof_p_id"))

    val pR = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("p_id"))
    val w = Window.partitionBy(col("event_id")).orderBy(col("p_ts").asc, col("p_id").asc)
    val brute = views
      .join(pR, col("user_id") === col("p_user") && col("p_ts") >= col("ts"), "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("p_id").as("asof_p_id"))

    assert(got.count() == views.count())
    assert(got.except(brute).count() == 0)
    assert(brute.except(got).count() == 0)
    assert(got.filter(col("asof_p_id").isNotNull).count() > 0)
  }

  test("asof join equals brute-force inequality join + row_number") {
    val ev = Tables.events(spark, graft.TestSpark.testdata("0.001"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_event_id"))

    val got = AsOfJoin.asof(purchases, views, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("asof_view_event_id"))

    // brute force: all (purchase, prior view) pairs, keep latest view
    val viewsR = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("view_event_id"))
    val w = Window.partitionBy(col("event_id")).orderBy(col("v_ts").desc, col("view_event_id").desc)
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

  test("asof carries the whole matched right row atomically (NULLs in carried columns)") {
    import spark.implicits._
    // key 1 has an older right row with non-null `a` and a newer one with
    // NULL `a`: per-column carry-forward would resurrect the older `a`
    // next to the newer `b` — the match must be all-or-nothing.
    val left = Seq((1, 25L), (1, 5L), (2, 35L)).toDF("k", "lt")
    val right = Seq(
      (1, 10L, Option("old"), Option("oldB")),
      (1, 20L, Option.empty[String], Option("newB")),
      (2, 30L, Option("x"), Option.empty[String])).toDF("k", "rt", "a", "b")
    val expect = Set(
      (1, 25L, Some(20L), None, Some("newB")), // NOT (…, Some("old"), Some("newB"))
      (1, 5L, None, None, None),
      (2, 35L, Some(30L), Some("x"), None))

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Int, Long, Option[Long], Option[String], Option[String])] =
      df.collect().map { r =>
        (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          Option(r.getString(3)), Option(r.getString(4)))
      }.toSet

    val windowed = AsOfJoin.asof(left, right, Seq("k"), "lt", "rt")
      .select("k", "lt", "asof_rt", "asof_a", "asof_b")
    val native = graft.plans.NativeAsOf.asof(left, right, Seq("k"), "lt", "rt")
      .select("k", "lt", "rt", "a", "b")
    assert(rows(windowed) == expect)
    assert(rows(native) == expect)
  }

  test("NULL join keys and NULL right times never match (SQL semantics, both impls)") {
    import spark.implicits._
    val left = Seq((Option(1), 10L), (Option.empty[Int], 10L)).toDF("k", "lt")
    val right = Seq(
      (Option(1), Option(5L), "ok"),
      (Option.empty[Int], Option(5L), "null-key"),   // must never match anything
      (Option(1), Option.empty[Long], "null-time")). // must never match anything
      toDF("k", "rt", "p")
    val expect = Set(
      (Some(1), 10L, Some("ok")),
      (None, 10L, None)) // null-extended, NOT matched to the null-key row

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Option[Int], Long, Option[String])] =
      df.collect().map { r =>
        (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getLong(1), Option(r.getString(2)))
      }.toSet

    val windowed = AsOfJoin.asof(left, right, Seq("k"), "lt", "rt")
      .select("k", "lt", "asof_p")
    val native = graft.plans.NativeAsOf.asof(left, right, Seq("k"), "lt", "rt")
      .select("k", "lt", "p")
    assert(rows(windowed) == expect)
    assert(rows(native) == expect)
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
