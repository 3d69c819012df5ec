package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Runtime skew handling: AQE must detect a dominant join key at
  * execution time and split its partition (`skew=true` in the final
  * adaptive plan). This is the automatic path for moderate skew;
  * `Skew.saltedJoin` (q60) is the explicit pre-shuffle path for extreme
  * skew — together they cover the hot-key story at scale.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (200k rows) vs 50 cold keys (100 rows each)
      val big = spark.range(200000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(5000).select((col("id") % 50 + 1).as("k"), col("id").as("v")))
      val dim = spark.range(51).select(col("id").as("k"), (col("id") * 2).as("w"))

      val joined = big.join(dim, "k")
      // collect() executes joined's OWN queryExecution (count() would
      // clone the plan and leave this one unexecuted/non-final)
      assert(joined.collect().length == 205000)

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$finalPlan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("reference-shaped hot (order, product) key is skew-split on corpus data") {
    // The reference's shipped data has 548 duplicated (orderId,
    // productId) logical keys (SURVEY §1.5) — real-world order streams
    // skew. This proves the J1 join's 100× story on actual corpus
    // tables, not a synthetic range: lineitem with its hottest
    // (l_orderkey, l_partkey) key amplified to reference-like
    // duplication joins orders without AQE giving up or a single
    // reducer eating the hot key — the final adaptive plan must carry
    // the skew-split marker.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val sfDir = TestSpark.testdata("0.001")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      // amplify one real key to hot-partition magnitude (the reference's
      // 548-dup pattern scaled to where the skew detector's byte
      // threshold engages at test-corpus size)
      // varying payload per replica: identical rows would compress to
      // ~nothing in the shuffle and stay under the skew byte threshold
      val hot = li.limit(1).select(col("l_orderkey"), col("l_partkey"))
      val skewed = li.union(hot.crossJoin(spark.range(100000))
        .select(col("l_orderkey"), col("l_partkey"), col("id").cast("double").as("l_quantity")))
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice"))
      val joined = skewed.join(orders, col("l_orderkey") === col("o_orderkey"))
      val n = joined.collect().length
      assert(n > 100000, s"join lost the amplified hot key: $n rows")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the corpus hot key:\n${finalPlan.take(4000)}")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
