package graft.ext

import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.functions.Money
import graft.state.Bucketing
import graft.tables.Tables

/** Judged demonstration of bucketed, co-located storage: the shuffle a
  * repeated fact-fact join needs is paid ONCE at write time and never
  * again at read time.
  *
  * q73 writes orders and lineitem bucketed (and sorted) by their join
  * key, then computes an order-priority revenue rollup by joining the
  * bucketed tables. Because both sides hash into the same bucket layout,
  * the sort-merge join runs with ZERO exchanges below it — at 100 TB
  * this is the difference between re-shuffling the fact table on every
  * query of a workload and never shuffling it at all. The `merge` hint
  * pins the join to SMJ so the demonstration doesn't silently degrade to
  * a broadcast at test scale; `PlanAuditSpec` locks the no-exchange,
  * no-sort property. The oracle computes the same rollup from the raw
  * parquet — bucketing must not change a single row.
  */
object BucketedOps {

  /** Bucket count for the demo tables. At a real 100 TB deployment this
    * is sized so one bucket ≈ one task's worth of data; what matters
    * for the property under test is only that both sides agree.
    */
  val Buckets = 16

  val q73BucketedJoin: QuerySpec = QuerySpec(
    (s, dir) => {
      Bucketing.writeBucketed(
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        "graft_q73_lineitem", Buckets, Seq("l_orderkey"))
      Bucketing.writeBucketed(
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
        "graft_q73_orders", Buckets, Seq("o_orderkey"))
      s.table("graft_q73_orders")
        .join(s.table("graft_q73_lineitem").hint("merge"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          Money.sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("o_orderpriority"))
    },
    """SELECT o_orderpriority, cast(count(*) AS bigint) AS n_items,
      |  cast(sum(cast(l_extendedprice AS decimal(12,2)) * (1 - cast(l_discount AS decimal(4,2)))) AS double) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)

  val all: Map[String, QuerySpec] = Map(
    "q73_bucketed_join" -> q73BucketedJoin)
}
