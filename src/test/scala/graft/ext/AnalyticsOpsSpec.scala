package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Cross-checks the distributed decile plan against the naive global
  * ntile window it replaced. The oracle gate proves q62b matches DuckDB;
  * this spec pins the *internal* equivalence: the range-repartition +
  * per-slice-offset ranking reproduces ntile(10) bucket arithmetic
  * bit-for-bit, so demoting the single-reducer form from the registry
  * lost nothing.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.testdata("0.001")

  test("distributed deciles == naive global-ntile deciles, bit for bit") {
    val dist = AnalyticsOps.q62bDecilesDist.run(spark, sfDir).collect()
    val naive = AnalyticsOps.q62NtileNaive.run(spark, sfDir).collect()
    assert(dist.length == 10 && naive.length == 10)
    dist.zip(naive).foreach { case (d, n) => assert(d == n, s"decile mismatch: $d vs $n") }
  }
}
