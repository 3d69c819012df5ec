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
    assert(spark.sql("SELECT rolling_hash('abc')").head().getLong(0) == 96354L)
    assert(spark.sql("SELECT rolling_hash('')").head().getLong(0) == 0L)
    assert(spark.sql("SELECT rolling_hash(cast(null AS string))").head().isNullAt(0))
  }

  test("rolling_hash rejects non-string input at analysis") {
    RollingHash.register(spark)
    intercept[Exception] { spark.sql("SELECT rolling_hash(42)").head() }
  }

  test("Money: scaled-long revenue path is value-identical to the decimal path") {
    // q01 sums revenue through Money.sumRevenueFast (primitive long
    // buffers survive the count-distinct expand; the >18-digit decimal
    // buffer allocates per partial update — observed 10×+ wall clock and
    // multi-second GC at sf0.1). The fast path is only admissible
    // because it is bit-identical to the exact decimal sum after the
    // final cast; lock that on the real corpus, per group.
    val li = spark.read.parquet(TestSpark.testdata("0.01") + "/lineitem.parquet")
    val both = li.groupBy(col("l_partkey")).agg(
      Money.sumRevenue(col("l_extendedprice"), col("l_discount")).as("dec_rev"),
      Money.sumRevenueFast(col("l_extendedprice"), col("l_discount")).as("fast_rev"))
    assert(both.filter(col("dec_rev") =!= col("fast_rev")).count() == 0)
    // property: per-row scaled units match the decimal product exactly.
    // Shift the decimal's scale away exactly (×10^4 in decimal, integral
    // result) — a double-side comparison would round twice and lie.
    val rowwise = li.select(
      (Money.discPrice(col("l_extendedprice"), col("l_discount")) * lit(10000)).cast("long").as("dec_u"),
      Money.revenueUnits(col("l_extendedprice"), col("l_discount")).as("long_u"))
    assert(rowwise.filter(col("dec_u") =!= col("long_u")).count() == 0)
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

  test("TopK short-circuit survives NaN and signed-zero kth entries") {
    // The full-buffer fast path compares against the kth entry; with an
    // IEEE compare a NaN kth would reject every subsequent better row
    // (NaN poisoning) and 0.0 vs -0.0 would tie where the buffer's total
    // order doesn't. reduce() must rank exactly like trim's sort key.
    val agg = new TopK(2)
    // fill the buffer with NaNs first, then feed real scores
    val poisoned = Seq(Double.NaN, Double.NaN, 5.0, 7.0).zipWithIndex
      .map { case (s, i) => (s, i.toLong) }
      .foldLeft(agg.zero)(agg.reduce)
    // total order ranks any real score above NaN
    assert(agg.finish(poisoned) == Seq((7.0, 3L), (5.0, 2L)))
    val zeros = Seq((-0.0, 10L), (1.0, 11L), (0.0, 12L))
      .foldLeft(agg.zero)(agg.reduce)
    // 0.0 outranks -0.0 in the total order, so it must displace it
    assert(agg.finish(zeros) == Seq((1.0, 11L), (0.0, 12L)))
  }

  test("TopK partial-merge distributivity over random splits (scalacheck)") {
    // The property map-side combine rests on: folding any partition of
    // the input into partial buffers and merging them must equal the
    // global sort+take — for ANY split, any k, ties, NaN and ±0.0
    // included. The unit tests pin specific edges; this locks the
    // algebra.
    val score = Gen.frequency(
      (8, Gen.chooseNum(-1e3, 1e3)),
      (1, Gen.oneOf(Double.NaN, 0.0, -0.0)),
      (1, Gen.oneOf(Double.MaxValue, Double.MinValue)))
    val gen = for {
      xs <- Gen.listOf(Gen.zip(score, Gen.chooseNum(0L, 40L)))
      k <- Gen.choose(1, 8)
      nSplit <- Gen.choose(1, 5)
    } yield (xs, k, nSplit)
    val p = Prop.forAll(gen) { case (xs, k, nSplit) =>
      val agg = new TopK(k)
      val sliceLen = math.max(1, xs.size / nSplit + 1)
      val partials = xs.grouped(sliceLen).map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
      merged == xs.sorted(TopKOrder.pair).take(k)
    }
    assert(SCTest.check(SCTest.Parameters.default, p).passed)
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

  test("hexSlice: Spark conv, the DuckDB strpos formula, and BigInt agree (scalacheck)") {
    // The q142 Bloom positions and q149 ring coordinates rest on this
    // three-way identity: Spark's conv(substring(hex)), the oracle's
    // positional strpos arithmetic, and plain base-16 parsing must give
    // one value for every slice of every hex string.
    import graft.ext.PortableHash
    val hexChar = Gen.oneOf(('0' to '9') ++ ('a' to 'f'))
    val gen = for {
      hex <- Gen.listOfN(32, hexChar).map(_.mkString)
      start <- Gen.choose(1, 19)        // slice stays inside 32 chars
      len <- Gen.choose(1, 14)          // the 56-bit exact window
    } yield (hex, start, math.min(len, 33 - start))
    // local replay of the oracle's strpos arithmetic — digit position
    // scaled by its power of 16, exactly the generated SQL
    def strposFormula(hex: String, start: Int, len: Int): Long =
      (0 until len).map { i =>
        ("0123456789abcdef".indexOf(hex(start - 1 + i)).toLong) *
          math.pow(16, len - 1 - i).toLong
      }.sum
    val p = Prop.forAll(gen) { case (hex, start, len) =>
      val expected = BigInt(hex.substring(start - 1, start - 1 + len), 16).toLong
      strposFormula(hex, start, len) == expected
    }
    assert(SCTest.check(SCTest.Parameters.default, p).passed)
    // the Spark leg once per distinct shape class (engine round-trip is
    // expensive per sample; the formula identity above is the bulk prop)
    val samples = Seq(("0123456789abcdef0123456789abcdef", 1, 12),
      ("ffffffffffffffffffffffffffffffff", 13, 12), ("a0b1c2d3e4f5061728394a5b6c7d8e9f", 7, 14))
    samples.foreach { case (hex, st, ln) =>
      val got = spark.range(1).select(
        PortableHash.hexSliceCol(lit(hex), st, ln).as("v")).head().getLong(0)
      assert(got == BigInt(hex.substring(st - 1, st - 1 + ln), 16).toLong,
        s"conv mismatch for ($hex, $st, $ln)")
    }
  }
}
