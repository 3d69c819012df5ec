package graft.state

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.tables.Tables

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-bucketed tables join with zero Exchange (shuffle paid at write time)") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_quantity"))
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_name"))
    Bucketing.writeBucketed(li, "li_bucketed", 8, Seq("l_partkey"))
    Bucketing.writeBucketed(p, "part_bucketed", 8, Seq("p_partkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("part_bucketed"), col("l_partkey") === col("p_partkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, dir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
