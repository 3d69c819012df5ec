package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.tables.Tables

/** Accuracy bounds for the approximate sketch aggregates (q37 is
  * rows-only at the oracle gate because HLL++/GK internals are
  * engine-specific — this spec pins what the gate can't: the estimates
  * are actually close to the exact answers).
  */
class SketchAccuracySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.testdata("0.01")

  test("HLL distinct counts and approx medians stay within error bounds") {
    val approx = Relational.q37SketchStats.run(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap

    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (d, m)) =>
      val (ad, am, n) = approx(flag)
      assert(n > 0)
      // HLL++ default rsd = 5%; allow 3 sigma
      assert(math.abs(ad - d).toDouble / d <= 0.15, s"$flag distinct: approx $ad vs exact $d")
      // GK percentile with accuracy 1000: rank error <= n/1000; price
      // spread per rank step is tiny, so 5% value tolerance is generous
      assert(math.abs(am - m) / m <= 0.05, s"$flag median: approx $am vs exact $m")
    }
  }
}
