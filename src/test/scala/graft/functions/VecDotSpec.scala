package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the native [[VecDot]] expression to the higher-order-function
  * form it replaced: identical left-fold double accumulation must be
  * BIT-exact (the DuckDB oracle computes the same fold), and the HOF
  * null semantics (null input / null element / length mismatch) must
  * survive the port.
  */
class VecDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.testdata("0.001")

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> cast(x AS double) * cast(y AS double)), cast(0 AS double), (acc, v) -> acc + v)"

  test("vec_dot is bit-exact with the aggregate(zip_with) fold on real embeddings") {
    VecDot.register(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(30)
    val pairs = e.select(col("vec_id").as("ida"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("embedding").as("b")))
    val rows = pairs
      .select(expr("vec_dot(a, b)").as("native"), expr(hof).as("ref"))
      .collect()
    assert(rows.length == 900)
    rows.foreach { r =>
      val (n, h) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToRawLongBits(n)
        == java.lang.Double.doubleToRawLongBits(h), s"$n != $h (bitwise)")
    }
  }

  test("vec_dot null semantics: null input, null element, length mismatch") {
    VecDot.register(spark)
    val df = spark.sql(
      """SELECT
        |  vec_dot(cast(NULL AS array<float>), array(cast(1 AS float))) AS null_input,
        |  vec_dot(array(cast(1 AS float), cast(NULL AS float)),
        |          array(cast(1 AS float), cast(1 AS float))) AS null_elem,
        |  vec_dot(array(cast(1 AS float)), array(cast(1 AS float), cast(2 AS float))) AS mismatch,
        |  vec_dot(array(cast(1.5 AS float), cast(2 AS float)),
        |          array(cast(3 AS float), cast(0.5 AS float))) AS plain,
        |  vec_dot(array(cast(1.5 AS double)), array(cast(2 AS float))) AS mixed
        |""".stripMargin)
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 1.5 * 3.0 + 2.0 * 0.5)
    assert(r.getDouble(4) == 3.0)
  }
}
