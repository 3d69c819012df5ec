package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: `runMain graft.Explain <query...> [sfDir]`
  * prints the formatted physical plan (pushdown, join strategy, codegen
  * spans) and a timed noop-materialization per named query — several
  * names share one JVM so a plan sweep doesn't pay Spark startup per
  * query. A trailing absolute path selects the data dir.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (names, sfDir) =
      if (args.length > 1 && args.last.startsWith("/")) (args.init.toSeq, args.last)
      else (args.toSeq, "/root/testdata/sf0.1")
    val name = names.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // runtime Bloom-filter join pruning on; the application-side scan
      // threshold (10 GB default) is lowered so the injected filter is
      // demonstrable and plan-audited at test scale — at production
      // scale the default gates it to genuinely large scans (q67)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "all") {
      // One-line physical-plan audit per query: join strategies, shuffle
      // count, scan pushdown — the red-flag sweep. Counted as plan-tree
      // NODES, not plan-string substrings (a substring count would fold
      // every BroadcastExchange into the shuffle count). AQE is disabled
      // here so executedPlan is the real tree rather than an opaque
      // AdaptiveSparkPlanExec leaf — the audit is about static shape.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan
          def c(f: PartialFunction[SparkPlan, Unit]) = plan.collect(f).size
          val pushed = plan.toString.contains("PushedFilters: [")
          println(f"[audit] $n%-28s exchanges=${c { case _: ShuffleExchangeExec => }}%2d bhj=${c { case _: BroadcastHashJoinExec => }} smj=${c { case _: SortMergeJoinExec => }} cartesian=${c { case _: CartesianProductExec => }} bnl=${c { case _: BroadcastNestedLoopJoinExec => }} pushed=${if (pushed) "y" else "-"}")
        } catch { case e: Throwable => println(s"[audit] $n FAILED: ${e.getMessage.take(80)}") }
      }
      spark.stop(); return
    }
    names.foreach { n =>
      println(s"==== $n ====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[explain] $n first run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[explain] $n warm run: ${(System.nanoTime() - t1) / 1e9}%.2f s")
      graft.core.Staging.sweepInvocationDirs(): Unit
    }
    spark.stop()
  }
}
