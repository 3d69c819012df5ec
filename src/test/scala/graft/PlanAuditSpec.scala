package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape regression suite: locks the physical-plan properties the
  * engine is designed around (broadcast joins for dim sides, parquet
  * filter pushdown, bounded shuffle counts) so an innocent-looking
  * refactor that silently degrades the 100 TB plan — a join falling back
  * to sort-merge, a filter no longer reaching the scan, an extra
  * exchange — fails CI, not the next benchmark.
  *
  * AQE is disabled per-plan here so `executedPlan` is the static tree
  * (the audit is about shape, not runtime re-planning).
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.testdata("0.001")

  // Memoized: building a plan is not free (q66 runs its micro-batch
  // replay as a construction side effect), and the registry-wide tests
  // below visit every entry — each query's plan is built exactly once
  // per suite run.
  private val planCache = scala.collection.mutable.Map.empty[String, SparkPlan]

  private def plan(name: String): SparkPlan = planCache.getOrElseUpdate(name, {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  })

  private def count(p: SparkPlan)(f: PartialFunction[SparkPlan, Unit]): Int =
    p.collect(f).size

  test("no query plans a cartesian product") {
    // Iterative operators (q46/q47) and funnel chains included: an
    // unconstrained cross anywhere is always a bug at scale.
    SparkEntry.queries.keys.foreach { n =>
      assert(count(plan(n)) { case _: CartesianProductExec => } == 0, s"cartesian in $n")
    }
  }

  /** True iff every row-producing path into `p` goes through an
    * aggregation before reaching a leaf — i.e. the operator above `p`
    * sees aggregate-bounded data, not raw scans. Walks the actual input
    * path: unary nodes pass through, a broadcast join follows its
    * STREAMED side (the build side never dominates output cardinality),
    * any other multi-child node requires all inputs bounded. A
    * collectFirst over the whole subtree would be fooled by a bounded
    * build side hanging off an unbounded probe.
    */
  private def aggregateBounded(p: SparkPlan): Boolean = {
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.{ExpandExec, GenerateExec}
    p match {
      case _: BaseAggregateExec => true
      // row-amplifying operators undo an aggregation's bound (e.g.
      // agg(collect_list) -> explode re-creates the raw set): anything
      // above them sees unbounded data again
      case _: GenerateExec | _: ExpandExec => false
      case j: BroadcastHashJoinExec =>
        aggregateBounded(if (j.buildSide == BuildRight) j.left else j.right)
      case j: BroadcastNestedLoopJoinExec =>
        aggregateBounded(if (j.buildSide == BuildRight) j.left else j.right)
      case u if u.children.size == 1 => aggregateBounded(u.children.head)
      case other if other.children.nonEmpty => other.children.forall(aggregateBounded)
      case _ => false // a leaf scan: raw data
    }
  }

  test("registry-wide: no unpartitioned window over unaggregated data") {
    // An ORDER BY window with no PARTITION BY funnels its entire input
    // through one task. That is only tolerable when the input is already
    // an aggregate (bounded rows — e.g. q62b's per-slice offsets over
    // <=numPartitions count rows); over raw data it is the q62-naive
    // scale-killer, banned for every judged query so a new entry can't
    // regress silently.
    SparkEntry.queries.keys.foreach { n =>
      plan(n).foreach {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          assert(aggregateBounded(w.child), s"unpartitioned full-data window in $n")
        case _ => ()
      }
    }
  }

  test("registry-wide: single-partition exchanges only above aggregates") {
    // Same property q62b pioneered, now for every judged query: a
    // shuffle into ONE partition may only ever carry already-aggregated
    // (bounded) data, never a raw scan.
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    SparkEntry.queries.keys.foreach { n =>
      plan(n).collect {
        case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
      }.foreach { e =>
        assert(aggregateBounded(e.child), s"single-partition exchange over unaggregated data in $n")
      }
    }
  }

  test("dim-sided joins broadcast instead of sort-merge at dim-fits scales") {
    for (n <- Seq("q01_revenue_per_product", "q02_orders_monthly", "q04_stock_status",
        "q07_best_sellers", "q08_exists_semi_join", "q18_lsh_pairs", "q47_dedup_survivors")) {
      val p = plan(n)
      assert(count(p) { case _: BroadcastHashJoinExec => } >= 1, s"no broadcast join in $n")
      assert(count(p) { case _: SortMergeJoinExec => } == 0, s"sort-merge fallback in $n")
    }
  }

  test("selective filters reach the parquet scan") {
    for (n <- Seq("q05_low_stock", "q06_point_lookup", "q21_cosine_topk"))
      assert(plan(n).toString.contains("PushedFilters: ["), s"no pushdown in $n")
  }

  test("similarity top-k is aggregator-bounded, not a window funnel") {
    // The scored (|corpus| × n_queries) subtree must be reduced by the
    // bounded TopK aggregator (map-side combine, ≤k rows per partition),
    // never a row_number window that funnels everything into n_queries
    // reducers. q48 keeps exactly one window — probe selection over the
    // (n_queries × K)-bounded centroid set, which never grows with data.
    for (n <- Seq("q21_cosine_topk", "q22_ann_lsh", "q69_int8_cosine"))
      assert(count(plan(n)) { case _: WindowExec => } == 0, s"window funnel in $n")
    assert(count(plan("q48_ann_ivf")) { case _: WindowExec => } <= 1,
      "q48 rerank regressed to a window funnel")
    assert(count(plan("q64_ann_ivf_kmeans")) { case _: WindowExec => } <= 1,
      "q64 rerank regressed to a window funnel")
  }

  test("q67 fact scan is pruned by an injected runtime Bloom filter") {
    // The selective dim predicate (p_brand = ...) must produce a
    // might_contain(xxhash64(l_partkey)) filter on the fact side, so
    // non-matching lineitem rows die before the join shuffle. This is
    // the 100 TB fact-join story: the filter is built from the filtered
    // dimension's keys at runtime, not authored in the query.
    // Structural, not string-matching: find FilterExec nodes whose
    // condition tree actually contains a BloomFilterMightContain, and
    // require one of them to filter the fact key (l_partkey) — a bloom
    // on the dimension side, or a pretty-print rename, can't fake this.
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.execution.FilterExec
    val p = plan("q67_bloom_pruned_join")
    val bloomFilters = p.collect {
      case f: FilterExec if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
    }
    assert(bloomFilters.exists(_.condition.references.exists(_.name == "l_partkey")),
      "no runtime bloom filter over l_partkey injected into q67's fact side")
  }

  test("q20 jaccard candidates are df-capped and the bucket shuffle is reused") {
    // Without the cap, a shingle shared by m docs emits O(m²) pair rows
    // in its bucket (boilerplate headers at 100× scale). The plan must
    // (a) size-filter the BoundedDistinct bucket arrays by JaccardDfCap
    // before any pair generation, and (b) compute the bucket shuffle
    // ONCE — the pairs branch and both size-join branches must read
    // ReusedExchanges of it, or candidate generation re-scans and
    // re-shingles the corpus per branch.
    import org.apache.spark.sql.catalyst.expressions.{Literal, Size}
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val p = plan("q20_jaccard_pairs")
    val capFilters = p.collect {
      case f: FilterExec
        if f.condition.exists(_.isInstanceOf[Size]) &&
          f.condition.exists {
            case Literal(v, _) => v == graft.ext.TextOps.JaccardDfCap
            case _ => false
          } => f
    }
    assert(capFilters.nonEmpty, "size-bounded df-cap filter missing from q20 plan")
    assert(count(p) { case _: ReusedExchangeExec => } >= 2,
      "q20's bucket shuffle is not reused across the pairs/sizes branches")
  }

  test("q73 bucketed join is co-located: no exchange below the join") {
    // Both sides are written bucketed by the join key, so the sort-merge
    // join must run directly over the bucketed scans — an Exchange below
    // it means the bucket layout was ignored and the fact tables are
    // being re-shuffled per query, the exact cost bucketing exists to
    // amortize away.
    val p = plan("q73_bucketed_join")
    val smjs = p.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, "q73 lost its sort-merge bucket join")
    smjs.foreach { j =>
      assert(j.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "exchange below q73's bucketed join — bucket co-location not used")
    }
  }

  test("q74 reads only the queried day-partitions of the event store") {
    // The 7-day window predicate must become a PARTITION filter over the
    // date-partitioned store — 7 of the 30 day-directories scanned, the
    // rest zero I/O. A dataFilter-only plan (filtered full scan) is the
    // regression this locks out.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val p = plan("q74_partitioned_events")
    val scans = p.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("graft_q74_events")) => f
    }
    assert(scans.nonEmpty, "q74 did not plan a scan over the partitioned store")
    scans.foreach { f =>
      assert(f.partitionFilters.exists(_.references.exists(_.name == "event_date")),
        "q74's day window did not become a partition filter")
      assert(f.selectedPartitions.partitionCount == 7,
        s"q74 scanned ${f.selectedPartitions.partitionCount} day-partitions, wanted 7")
    }
  }

  test("q124's date window is pushed down to the orders scan") {
    // The deep star join's only selective fact-side predicate must reach
    // the parquet reader as pushed data filters (footer min/max skipping
    // at scale), not evaluate post-scan. Structural: the orders
    // FileSourceScanExec must carry o_orderdate bounds in its
    // pushedDownFilters.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val p = plan("q124_regional_revenue")
    val scans = p.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("orders")) => f
    }
    assert(scans.nonEmpty, "q124 did not plan a parquet scan over orders")
    assert(scans.exists(_.metadata.get("PushedFilters")
        .exists(s => s.contains("GreaterThanOrEqual(o_orderdate") &&
          s.contains("LessThan(o_orderdate"))),
      "q124's date window did not push down to the orders scan")
  }

  test("q75 shard packing reads ONE materialization of the range shuffle") {
    // Same exchange-reuse property as q62b, for the shard packer: the
    // per-slice sums and the local prefix windows must read the SAME
    // materialized range shuffle (one full-data range exchange, second
    // reference a ReusedExchange) — two independent range sorts could
    // sample different boundaries and split a slice across pids.
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val p = plan("q75_shard_packing")
    val fullDataRange = p.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[RangePartitioning] &&
          !aggregateBounded(e.child) => e
    }
    assert(fullDataRange.size == 1,
      s"expected 1 shared full-data range exchange in q75, got ${fullDataRange.size}")
    assert(count(p) { case _: ReusedExchangeExec => } >= 1,
      "q75's second range-shuffle reference is not a ReusedExchange")
  }

  test("q78 range join runs as a bucket equi-join, never a nested loop") {
    // The hour-bucket decomposition must surface as an equi hash join
    // (broadcast at this scale) with the ts-range predicate as a
    // residual; a BroadcastNestedLoopJoin means the range predicate is
    // being evaluated against every (event, interval) pair — the exact
    // plan the decomposition exists to prevent. The busiest-user top-10
    // must be TakeOrderedAndProject, not a full global sort.
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val p = plan("q78_range_join_buckets")
    assert(count(p) { case _: BroadcastNestedLoopJoinExec => } == 0,
      "q78's range join degraded to a nested loop")
    assert(count(p) { case _: BroadcastHashJoinExec => } >= 1,
      "q78 lost its bucket equi-join")
    assert(count(p) { case _: TakeOrderedAndProjectExec => } >= 1,
      "q78's top-10 owners is not a bounded TakeOrderedAndProject")
  }

  test("q116 candidate joins are IVF-blocked, never label-only all-pairs") {
    // The admission screen's candidate joins must carry the probe-list
    // key (probe = list_r / list_j): an equi-join whose ONLY keys are
    // label columns is the O(|shard| × |corpus| / n_labels) all-pairs
    // form — quadratic per label when labels are few — that the IVF
    // blocking exists to prevent. Checked on the optimized logical plan:
    // every join condition's equality attributes must not collapse to
    // label-only.
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val labelish = Set("label", "label_r", "label_j")
    val lp = SparkEntry.queries("q116_shard_admission")(spark, sfDir)
      .queryExecution.optimizedPlan
    lp.foreach {
      case j: Join =>
        val eqAttrs = j.condition.toSeq.flatMap(_.collect {
          case e: EqualTo => e.references.map(_.name).toSeq
        }.flatten).toSet
        assert(!(eqAttrs.nonEmpty && eqAttrs.subsetOf(labelish)),
          s"label-only equi-join in q116: keys=$eqAttrs")
      case _ => ()
    }
  }

  test("incremental-family queries never broadcast-hint a shard-derived (corpus-proportional) frame") {
    // The incoming shard is DEFINED as 20% of doc_ids — corpus-
    // proportional, not fixed-size — so a forced broadcast of its band
    // rows (or of the dup sets derived from them) is a driver OOM at
    // 100 TB. The join strategy for those frames must be left to the
    // planner (AQE / size estimation picks broadcast only when the
    // delta actually fits). The ONLY broadcast hints allowed are the
    // split-threshold scalar aggregates: groupingExpressions.isEmpty ⇒
    // exactly one row at any scale. Checked on the optimized logical
    // plan, where EliminateResolvedHint has attached every surviving
    // hint to its Join node — a hint anywhere else cannot hide.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    def scalarAgg(p: LogicalPlan): Boolean = p match {
      case a: Aggregate => a.groupingExpressions.isEmpty
      case u if u.children.size == 1 => scalarAgg(u.children.head)
      case _ => false
    }
    for (n <- Seq("q101_incremental_neardup", "q111_contamination_fps", "q116_shard_admission",
        "q117_shard_ingest_e2e")) {
      val lp = SparkEntry.queries(n)(spark, sfDir).queryExecution.optimizedPlan
      lp.foreach {
        case j: Join =>
          def broadcastHinted(h: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo]) =
            h.exists(_.strategy.contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST))
          if (broadcastHinted(j.hint.leftHint))
            assert(scalarAgg(j.left), s"broadcast hint on a non-scalar left side in $n")
          if (broadcastHinted(j.hint.rightHint))
            assert(scalarAgg(j.right), s"broadcast hint on a non-scalar right side in $n")
        case _ => ()
      }
    }
  }

  test("prefix/rank queries hash-shuffle only aggregated data (range sort is the one full pass)") {
    // The slice id comes from monotonically_increasing_id arithmetic,
    // NOT Window.partitionBy(pid): the window form forces a SECOND
    // full-data hashpartitioning(pid) exchange right after the range
    // sort (ClusteredDistribution(pid) is not satisfied by
    // RangePartitioning) — the regression this test locks out. Every
    // hash exchange left must carry pre-aggregated (bounded) rows.
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    for (n <- Seq("q62b_deciles_dist", "q75_shard_packing")) {
      plan(n).collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }.foreach { e =>
        assert(aggregateBounded(e.child), s"full-data hash exchange in $n")
      }
    }
  }

  test("q62b deciles: single-partition stages only ever see bounded data") {
    // The scale-safe decile plan may use single-partition exchanges ONLY
    // above an aggregation (the ≤numPartitions slice-count rows), never
    // over the raw orders scan — that would be q62's global-ntile funnel
    // sneaking back in. Also require the distributed range sort to exist.
    import org.apache.spark.sql.catalyst.plans.physical.{RangePartitioning, SinglePartition}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val p = plan("q62b_deciles_dist")
    val singles = p.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }
    singles.foreach { e =>
      assert(e.child.collectFirst { case a: BaseAggregateExec => a }.isDefined,
        "single-partition exchange over unaggregated data in q62b")
    }
    assert(p.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }.nonEmpty, "q62b lost its distributed range sort")
  }

  test("q62b offsets and ranks read ONE materialization of the range shuffle") {
    // Exact ranks require the per-slice counts (offs) and the local
    // row_numbers (ranked) to see identical range boundaries and pids.
    // That must come from exchange reuse — one materialized shuffle both
    // subtrees read — not from two executions that happen to sample the
    // same boundaries. Exactly one range exchange over the full data may
    // exist; the second reference must be a ReusedExchange (the final
    // decile output sort is also range partitioning, but over ≤10
    // aggregated rows — identified by its sub-partition-count input).
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val p = plan("q62b_deciles_dist")
    val fullDataRange = p.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[RangePartitioning] &&
          e.outputPartitioning.asInstanceOf[RangePartitioning].ordering.size == 2 => e
    }
    assert(fullDataRange.size == 1,
      s"expected 1 shared full-data range exchange, got ${fullDataRange.size}")
    assert(count(p) { case _: ReusedExchangeExec => } >= 1,
      "q62b's second range-shuffle reference is not a ReusedExchange")
  }

  test("shuffle budgets hold for headline plans") {
    // Upper bounds from the audited round-2 plans (graft.Explain all);
    // an increase means a new exchange crept into the hot path.
    val budget = Map(
      "q00_pricing_summary" -> 2, "q01_revenue_per_product" -> 3,
      "q02_orders_monthly" -> 2, "q11_upsert_lww" -> 2,
      "q17_minhash_sig" -> 1, // expression-computed signature: sort only
      "q19_simhash" -> 1,     // expression-computed signature: sort only
      "q36_simhash_pairs" -> 2,
      "q23_tumbling_windows" -> 2,
      "q21_cosine_topk" -> 2, // topk agg + output sort; corpus side never shuffles
      "q30_sessionize" -> 2,
      // 5 exchanges but every one is map-side-combined or broadcast-feeding
      // (tf agg; df-side dedupe+agg, vocab-bounded; scalar n_docs; output
      // sort) — the r2 form was 4 but shuffled AND SORTED the full
      // (doc,tok,tf) set by the zipf-skewed token key in a window
      "q34_tfidf" -> 5,

      "q41_asof_native" -> 3, "q48_ann_ivf" -> 4,
      // round-5 additions, audited at introduction (Explain all):
      // every exchange is map-side-combined, group-sized, or the
      // output sort; q91's six are the checkpointed-edge graph rounds
      "q71_decontaminate" -> 4, "q72_repetition" -> 3,
      // q86: round-6 single-pass BoundedDistinct rewrite — one full-data
      // hash exchange (the bucket groupBy) + the output sort
      "q85_quality_topp" -> 2, "q86_inverted_index" -> 2,
      "q87_collocation_lift" -> 4, "q88_rate_anomaly" -> 3,
      "q89_degree_histogram" -> 4, "q90_incremental_agg" -> 3,
      "q91_pagerank" -> 6, "q92_format_roundtrip" -> 2,
      "q93_transition_matrix" -> 4,
      // round-6 additions, audited at introduction (Explain all):
      // q102 = chunk-key window + doc reassembly + output sort; q103's
      // judged merge plan = rest-artifact sort + delta index groupBy +
      // full-outer SMJ + output sort (the at-rest build is a separate
      // staged job, not in the judged plan)
      // q101's 8 count 4 single-row scalar aggs (the split threshold,
      // recomputed per branch — 2-row exchanges, not data movement)
      "q98_chunk_dedup" -> 3, "q101_incremental_neardup" -> 8,
      "q102_boilerplate" -> 3, "q103_incremental_index" -> 4,
      // q104 = scalar min/max agg + 64-key rollup + output sort
      "q104_zorder_layout" -> 3,
      // q105 = 2 scalar threshold aggs + rest/delta distincts + doc
      // rollup + output sort; the probe join itself adds none (broadcast
      // at test scale, co-partitioned SMJ at cluster scale)
      "q105_shard_novelty" -> 6,
      // q106 = token count + the pinned range shuffle, then only
      // vocab-sized/nPart-sized exchanges (offsets, windows, selection,
      // output sort) — the corpus-sized count runs exactly once
      "q106_vocab_coverage" -> 8,
      // q107 = (label,dim) centroid agg + per-label collect + bounded
      // top-5 agg + output sort; the corpus side joins broadcast
      "q107_embedding_outliers" -> 4,
      // q108 = codec mapPartitions on the scan partition, then one
      // 20-group rollup + output sort; payloads never cross an exchange
      "q108_image_decode" -> 2,
      // q109 = three probe-grouped rollups over index/pruned reads (the
      // indexes are 64 rows; the data join is broadcast) + the 6-row
      // result assembly + output sort — all exchanges bounded or tiny
      "q109_zorder_prune" -> 6,
      // q116 (round-8 IVF-blocked rewrite, audited at introduction): 10
      // of the 19 are single-row scalar-agg exchanges (split threshold +
      // centroid codebook, recomputed per branch — 1-row frames, not
      // data movement, the q101 accounting); the rest are the two
      // candidate-dedupe distincts, the four candidate/rollup join
      // sides, and the 10-row output sort. The corpus-scale work rides
      // the (probe-list, label)-keyed joins, never a label-only pairing
      "q116_shard_admission" -> 19,
      // q117 (round-8, audited at introduction): the judged summary plan
      // reads the staged artifacts (admissions / appended corpus /
      // at-rest index — the admission build is a separate staged job,
      // the q103 accounting), so its 12 are: five 1-row scalar-agg
      // exchanges (one per summary leg), the delta-index semi-join +
      // groupBy, the full-outer index-merge sides, the two novelty
      // distincts + probe, and the 12-row output sort
      "q117_shard_ingest_e2e" -> 12,
      // q118 = codec mapPartitions on the scan partition, then one
      // (source × frame)-group rollup + output sort — the q108 shape;
      // payloads never cross an exchange
      "q118_gif_frames" -> 2,
      // q119 (round-8, audited at introduction): gram-keyed df-band agg
      // + band join-back + the two self-join sides + the (pair, diag)
      // island window + run/pair rollups + output sort — every exchange
      // keyed, per-key rows bounded by cap²/run length
      "q119_repeated_spans" -> 10,
      // q120 (round-8, audited at introduction): list-assignment argmax
      // agg + the single-row codebook aggregates (scalar exchanges) +
      // the probe window over (queries × K) rows + bounded top-k agg +
      // output sort; the coded corpus side joins the broadcast probe
      // set, so no corpus-sized exchange exists
      "q120_ivfpq_ann" -> 9,
      // q121 (round-8, audited at introduction): the q119 match subtree
      // (one pass — both match endpoints explode from one scan of m) +
      // the doc-keyed position distinct, lag/sum windows and island
      // rollup (per-key rows ≤ doc length) + doc-tokens join + sort
      "q121_span_coverage" -> 11,
      // q122 (round-8, audited at introduction): round state pinned per
      // round (the q46/q91 Checkpoints contract), so the judged plan
      // reads materialized loop state — the corpus-scan words agg, the
      // round-2 pair groupBy + winner TakeOrdered, the merge-count
      // rollup and the 2-row assembly/sort
      "q122_bpe_merges" -> 5,
      // q123 (round-8, audited at introduction): edge frame pinned once
      // (4 consumers), then the degree rollup, the two wedge/closure
      // join sides, the per-vertex triangle rollup, the deg≥2 join and
      // the output sort — all keyed on vertex/edge ids
      "q123_triangle_clustering" -> 7,
      // q124 (round-8, audited at introduction): the deep star join —
      // all five dim joins broadcast (the bounded dims hinted, the fact
      // sides planner-chosen at test scale), so the only exchanges are
      // the nation rollup partial/final pair's hash exchange + the
      // 5-row output sort; the date window is pushed to the orders scan
      "q124_regional_revenue" -> 2,
      // q125 (round-8, audited at introduction): 2 single-row codebook
      // scalar exchanges (recomputed per test/train branch — 1-row
      // frames, the q101/q116 accounting), the bounded TopKCarry
      // neighbor agg, the per-probe vote window (≤10 rows per key), the
      // confusion rollup and the ≤100-row output sort. The train side
      // is UNHINTED — broadcast at test scale by stats, SMJ at corpus
      // scale — and candidates ride the (probe-list)-keyed join only
      "q125_knn_classify" -> 6,
      // q126 = codec mapPartitions on the scan partition, then one
      // (source × frame)-group rollup + output sort — the q108/q114
      // shape; payloads never cross an exchange
      "q126_audio_frames" -> 2,
      // q127 (round-8, audited at introduction): the judged plan reads
      // TWO pinned frames (the range-sliced corpus — one corpus-sized
      // read feeding the partial-cut rollup — and the (partitions ×
      // sources) rollup), so every exchange is source/partition-bounded:
      // the offset/weight windows and scalar totals recomputed per
      // branch, the ≤sources-row rollups, and the output sort/join
      "q127_mixing_schedule" -> 12,
      // q128 (round-8, audited at introduction): cluster labels come
      // from the pinned CC loop state (the q46/q115 machinery, outside
      // the judged plan), so the judged 4 are: the cluster-membership
      // join side, the (cluster, dim) centroid agg, the per-cluster
      // argmin rollup, and the output sort — all keyed on cluster_id,
      // nothing label-bounded is broadcast
      "q128_cluster_reps" -> 4,
      // q129 (round-8, audited at introduction): both contamination
      // legs aggregate to distinct-doc verdict frames BEFORE joining
      // the base corpus (two eval-distincts, the fuzzy per-doc rollup,
      // the exact-flag distinct), then the ≤sources rollup pair + the
      // output sort; the eval-keyed leg joins carry no broadcast hint
      "q129_decontam_pipeline" -> 8,
      // q130 (round-8, audited at introduction): the CC machinery's
      // label-propagation rounds plus the split assignment (a pure hash
      // of cluster_id — zero added exchanges) and the two leak-audit
      // joins; every join is an unhinted doc-keyed equi-join the
      // planner sizes itself
      "q130_leakage_safe_split" -> 8,
      // q131 (round-8, audited at introduction): GIF-leg pre-aggregate,
      // the final per-source rollup, and the output sort; the three
      // modality joins carry ≤1 narrow row per doc and no payload ever
      // crosses an exchange (MultimodalSpec's binary lint)
      "q131_multimodal_manifest" -> 3,
      // q132 (round-8, audited at introduction): token-count groupBy,
      // the rankedVocab range sort + its nPart-row offset agg, the
      // per-doc aggregate, and the per-source rollup/sort; the token→
      // rank join is an unhinted `w` equi-join the planner sizes
      "q132_rank_quality" -> 5,
      // q133 (round-9, audited at introduction): signatures are pinned
      // at the codec boundary (payloads never cross an exchange), so
      // the judged 3 are the bucket-cap rollup, the pair distinct, and
      // the output sort; both banded join sides are planner-sized
      // (broadcast at test scale, (band,v)-keyed SMJ at corpus scale)
      "q133_image_neardup" -> 3,
      // q135 (reworked round 11): the three modalities run through ONE
      // (modality, band, v)-keyed pairing pass whose exchanges happen
      // behind the pair pin (the pairing scheme itself stays audited by
      // q133's unpinned 3-exchange budget — same shared helper — and by
      // MultimodalSpec's keyed-pairing plan + equivalence tests); the
      // judged consumer plan is the three per-modality rollups (items /
      // pair stats / flagged distinct), the static 3-row modality spine
      // join (oracle emits all three rows unconditionally), the modality
      // joins reusing the rollups' hash partitioning, and the 3-row
      // output sort
      "q135_multimodal_neardup" -> 6,
      // q136 (round-9, audited at introduction): the purge accounting —
      // the (sh, doc_id) distinct + touched-term recount feed the pinned
      // aff frame (read by five 1-row metric aggregates — scalar
      // exchanges, the q101/q116 accounting); the maintenance legs are
      // term-keyed joins over the pinned old index; the certification
      // rebuild + full-outer compare and the near-dup bucket distinct
      // are the remaining keyed exchanges; output sort is 10 rows
      "q136_deletion_purge" -> 14,
      // q138 (round-9, audited at introduction): twelve checks = mostly
      // 1-row scalar-agg exchanges (one per report row + the shared
      // count frames — the q101/q116 accounting) plus the two
      // uniqueness groupBys, the anti-join sides and the 12-row output
      // sort; the five lineitem single-table checks share ONE scan
      // pass, and every RI anti-join is planner-sized (dims broadcast)
      "q138_data_quality" -> 26,
      // q139 (round-9, audited at introduction): the shard threshold is
      // a 1-row scalar exchange (recomputed per consumer branch — the
      // q101/q116 accounting), then the bucket-cap rollup, the two
      // screen-join sides' exchanges, the two verdict distincts, the
      // per-source rollup and the 20-row output sort; the probe side of
      // every screen is shard-sized and bucket-keyed
      "q139_image_shard_admission" -> 14,
      // q134 (round-9, audited at introduction): the composed card —
      // the q46 CC machinery's banded-LSH + label-propagation exchanges
      // dominate (cluster labels feed the split hash, which itself adds
      // zero shuffles); the rest are the two contamination-leg
      // aggregates + eval distincts, the gate-survivor joins, the
      // ≤sources rollup pair, the bounded weight/total windows and the
      // output sort — every post-rollup exchange is source-cardinality
      "q134_training_data_card" -> 14,
      // q140 (round-9, audited at introduction): unigram margin pinned
      // (its exchange happens once, before the pin); the remaining
      // exchanges are the bigram-count groupBy, the instance-stream join
      // exchanges against the two vocab-bounded margins, the N scalar,
      // the per-doc and per-source rollups and the 20-row output sort
      "q140_bigram_coherence" -> 9,
      // q144 (round-9, audited at introduction): the shared
      // coherencePerDoc frame's exchanges (see q140) + the 7-row
      // threshold lattice as a broadcast cross join, the per-threshold
      // rollup and the 7-row output sort
      "q144_coherence_calibration" -> 9,
      // q145 (round-9, audited at introduction): the doc_id window
      // exchange feeds both chunk rollups (subset-key partitioning);
      // the remaining exchanges are the two (base_id, fp) probe joins'
      // sides, the per-variant distinct-count pair, the vstat⋈fstat
      // join, the ≤sources rollup and the 20-row output sort — every
      // window is PARTITIONED by doc_id (doc-bounded state)
      "q145_cdc_chunking" -> 12,
      // q146 (round-9, audited at introduction): one map-side-combined
      // events rollup to the (type, hour)-bounded rate frame; the
      // type-keyed margins join, the two PARTITIONED windows' exchange,
      // the per-type rollup and the 5-row output sort all live on that
      // bounded frame
      "q146_cusum_drift" -> 6,
      // q147 (round-9, audited at introduction): one map-side-combined
      // groupBy to the bounded class frame, the per-k rollup (threshold
      // lattice broadcast) and the 4-row output sort
      "q147_k_anonymity" -> 4,
      // q148 (round-9, audited at introduction): the user-PARTITIONED
      // PIT window's exchange, the map-side-combined naive margin, the
      // user-keyed example join and the ≤31-row rollup + output sort
      "q148_pit_features" -> 5,
      // q149 (round-9, audited at introduction): assignment is a pure
      // array expression over the 1-row broadcast rings (zero shuffles
      // per key; frame pinned before its four consumers); the exchanges
      // are the four ≤shards rollups' and the 5-row output sort
      "q149_consistent_hashing" -> 7,
      // q150 (round-9, audited at introduction): one corpus scan feeds
      // the level-0 scalar agg and the bucket groupBy (fixed 64-doc
      // ordered-concat state); the root agg and the level rows are
      // 1-row/bucket-count-bounded exchanges + the 3-row output sort
      "q150_merkle_diff" -> 8,
      // q151 (round-9, audited at introduction): THREE component solves
      // (base, contracted, batch-for-the-proof) dominate — per-round
      // label exchanges on pinned frames, the q46/q58 cost class; the
      // rest are the edge-split filters, the contraction joins and the
      // 1-row metric aggregates. At production the batch leg is the
      // PROOF being judged, not the serving path — the incremental leg
      // alone touches only the shard-incident edges
      "q151_incremental_cc" -> 42,
      // q152 (round-10, audited at introduction): the base/appended
      // corpus pins' exchanges happen once before their four consumers;
      // after them the two TopKCarry cap rollups (map-side-combined,
      // O(Cap) state — never a per-source window over the corpus), the
      // four per-source count rollups, the cap-eviction anti-join on
      // the bounded kept-sets, the threshold-eviction doc_id anti-join
      // and the ≤sources output sort
      "q152_sampling_stability" -> 9,
      // q141 (round-9, audited at introduction): every exchange is
      // fingerprint-keyed (base/batch/shard-first groupBys, the anti
      // probe, the full-outer equivalence compare) or a ≤sources rollup;
      // the at-rest survivor frame is pinned before its three consumers
      "q141_dedup_equivalence" -> 12,
      // q142 (round-9, audited at introduction): fingerprint distinct +
      // position distinct feed the two pinned frames (exchanges happen
      // once, before the pins); after them the probe side's
      // position-keyed join exchanges, the m scalar, the per-source
      // rollup and the 20-row output sort
      "q142_bloom_admission" -> 9,
      // 5 since runtime Bloom filters: each funnel stage's scan is now
      // pruned by might_contain over the prior stage's user set (the
      // right 100 TB shape — stage scans shrink instead of shuffling
      // non-survivors); the differing injected filters change subtree
      // canonical forms, costing one exchange reuse at test scale
      "q50_funnel" -> 5,
      // STREAMING family (round-11 close of the budget-regime gap):
      // what plan(n) audits for a streaming query is the judged
      // CONSUMER plan — the replay harness runs as a construction side
      // effect and its micro-batch plans are not part of the returned
      // DataFrame, so these budgets bound the batch composition over
      // the (bounded) sink: rollups, certificate joins and batch
      // margin legs. The stateful operator's own exchanges are sized
      // by the replay's state partitions (ReplayFiles), asserted
      // order-independent by the streaming specs, and are not
      // exchange-countable here by construction.
      // q66/q68: max_by(seq) convergence rollup + output sort/explode
      "q66_streaming_topk" -> 2, "q68_streaming_retention" -> 3,
      // q70: one windowed rollup over the sink
      "q70_streaming_windows" -> 1,
      // q77: per-(source) rollup + output sort on the deduped sink
      "q77_streaming_dedup" -> 2,
      // q84: join-count rollup + output sort
      "q84_stream_stream_join" -> 2,
      // q99: flagged-distinct + per-source rollup + output sort
      "q99_streaming_neardup" -> 3,
      // q137: the netted-delta window/rollup pair over the sink + the
      // doc rollup and output sort; headroom for the exactFlags
      // re-seed legs, which the tombstone short-circuit removes from
      // the audited (headroom-corpus) plan but which join in whenever
      // a saturated bucket exists
      "q137_streaming_image_neardup" -> 12,
      // q143: static-fingerprint distinct (pinned), seen/blocked margin
      // rollups, admitted rollup + output sort
      "q143_streaming_admission" -> 4,
      // q153: q137's consumer plus the pre/post batch hammingDupPairs
      // margin legs and the equivalence certificate's accounting (the
      // re-seed legs short-circuit out at headroom, as in q137)
      "q153_streaming_neardup_purge" -> 16,
      // q154: the max_by convergence rollup, the three first-touch
      // groupBys (full / admitted / certificate), the full-outer
      // certificate join sides and the broadcast 1-row scalar frames
      "q154_watermark_funnel" -> 9,
      // q155 (batch calibration over the q154 cut rule, audited at
      // introduction): the (delay, user) admitted rollup riding the
      // broadcast 5-row lattice, the full-stage groupBy, the per-user
      // churn join sides, the two ≤5-row delay rollups, the 1-row
      // total scalar and the 5-row output sort
      "q155_watermark_calibration" -> 7,
      // q157 (round-12, audited at introduction): the consumer derives
      // per-doc verdicts from ONE doc-keyed rollup over the sink + the
      // doc join, then the full-outer per-doc certificate against the
      // batch admissionVerdicts leg (whose band groupBy/window/probe
      // exchanges are the intentionally-full verification pass, q141's
      // convention) and the ≤sources rollup + output sort
      "q157_streaming_shard_ingest" -> 11,
      // q156 (round-12, audited at introduction): the store round-trip
      // is a construction side effect (q74/q103 staging convention);
      // the judged plan is per-part aggregation over the two retained
      // versions — the post version's shared content+file rollup, the
      // pre version's pruned file rollup, the full-row multiset groupBy
      // pair + their full-outer SMJ (the content-invariance
      // certificate, intentionally whole-table), the equiv per-part
      // rollup and the 5-row output sort; the part-keyed assembly
      // joins broadcast
      "q156_compaction_cert" -> 10,
      // q158 (round-12, audited at introduction): the CDC aggregates
      // are pinned ≤3-row frames materialized at construction (they
      // MUST drain before vacuum deletes the version dirs they read —
      // the lifecycle contract the query certifies), so the judged
      // plan is the post-vacuum 1-row rollup + the kv output sort
      "q158_state_cdc_vacuum" -> 2,
      // q159 (round-13, audited at introduction): the landing-dir
      // staging is a construction side effect (q74/q103 convention);
      // the judged plan is one multi-file CSV scan feeding the 3-group
      // rollup (one hash exchange) + the 3-row output sort — the
      // reader path itself is scan-parallel, shuffle-free
      "q159_csv_ingest_cert" -> 2,
      // q160 (round-13, audited at introduction): the store lifecycle
      // (load → sync rewrite → evolved ingest → no-op syncs) is a
      // construction side effect; the judged plan is one store scan
      // into the 1-row content rollup + the 13-row metric sort — the
      // contract frame is a broadcast-free range(1) explode
      "q160_schema_evolution_cert" -> 2,
      // q161 (round-13, audited at introduction): the whole reference
      // flow (stage → sync → two CSV-fed upserts) is construction; the
      // judged plan is the final store scan into the 3-group rollup +
      // the 3-row output sort
      "q161_reference_flow_e2e" -> 2,
      // q162 (round-13, audited at introduction): both store lifecycles
      // (streamed + the shared batch leg) are construction; the judged
      // plan is the streamed store's rollup, the ±1-weighted union
      // groupBy pair for the full-row multiset equivalence (one content
      // exchange + the 3-row re-group), and the output sort
      "q162_streaming_flow_e2e" -> 4,
      // q163 (round-14, audited at introduction): both store builds are
      // construction (q161's orders flow + the inventories leg); the
      // judged plan is the orders store scan into the per-product
      // partial-agg exchange, the catalog join, and the output range
      // sort. Budget is the HINT-FREE WORST CASE of 3 (key exchanges
      // on both join sides): the OBSERVED plan at audit scale is 2
      // because the optimizer stats-sizes a broadcast of the post-agg
      // sold side, but the query deliberately carries no hint (the
      // catalog side is corpus-proportional — the house rule), so a
      // stats or autoBroadcastJoinThreshold drift legitimately flips
      // the audited plan to the shuffle join without any regression;
      // pinning 2 would fail the budget on optimizer weather
      "q163_store_report_cert" -> 3,
      // q164 (round-14, audited at introduction): the store build is
      // construction and the CDC feed + maintained report are pinned
      // (multi-consumer discipline), so the judged plan is the
      // recompute certificate leg's scan-agg, the ±1-weighted
      // union-groupBy equivalence pair, and the output sort
      "q164_incremental_report_cert" -> 4,
      // q165 (round-15, audited at introduction): the streamed store
      // build AND every per-drain maintenance fold are construction
      // (each step's report and CDC keys are pinned — the maintained
      // artifact must not accrete lineage across drains), so the
      // judged plan is q164's consumer shape off the PINNED final
      // report: the recompute leg's scan-agg, the ±1-weighted
      // union-groupBy equivalence pair, and the output sort
      "q165_streaming_report_maint" -> 4,
      // q166 (round-15, audited at introduction): the store build is
      // construction; the judged plan is one store scan into the
      // (product, year, month) rollup exchange + the output range sort
      "q166_store_monthly_cert" -> 2,
      // q167 (round-15, audited at introduction): the streamed flow +
      // every durable fold are construction (each fold WRITES a report
      // version — the durable write is the lineage truncation), so the
      // judged plan is the report table's parquet scan joined to the
      // recompute certificate leg's scan-agg via the ±1-weighted
      // union-groupBy pair, plus the output sort. Budget is the
      // hint-free worst case of 6 (key exchanges on both certificate
      // join sides — the q163 lesson); the observed plan at audit
      // scale is 4, riding a stats-sized broadcast of the small
      // report side
      "q167_durable_report_resume" -> 6,
      // q168 (round-16, audited at introduction): q167's consumer
      // shape exactly — the retention vacuum is a driver-side
      // directory delete with no executor work, so the judged plan is
      // unchanged: report scan ⋈ recompute certificate leg via the
      // ±1-weighted union-groupBy + output sort. Same hint-free
      // worst-case budget of 6; observed 4 at audit scale (the
      // stats-sized report-side broadcast)
      "q168_retention_safe_resume" -> 6,
      // q169 (round-16, audited at introduction): the streamed build
      // and every two-level fold are construction (lvl1/top pinned per
      // step); the judged plan is the two pinned artifact scans, the
      // recompute certificate legs (store scan → (group, product)
      // rollup → argmax regroup), TWO ±1-weighted union-groupBy pairs
      // (level-1 and top multiset certificates — the honest price of
      // certifying both levels), the pinned-lvl1 n_products rollup,
      // and the 3-row output sort: 9 observed, all three consumer
      // joins riding stats-sized broadcasts of ≤3-row frames. Budget
      // is the hint-free worst case of 13 (the q163 lesson: key
      // exchanges on the certificate join sides if a stats drift
      // drops the broadcasts)
      "q169_maintained_top_sellers" -> 13,
      // q170 (round-17, audited at introduction): q169's consumer
      // shape exactly — the purge is one store-version rewrite and the
      // purge fold is construction (pinned artifacts), so the judged
      // plan is the two pinned artifact scans, the recompute
      // certificate legs off the PURGED store, the two ±1-weighted
      // union-groupBy pairs, the n_products rollup, and the 3-row
      // sort. Same hint-free worst-case budget of 13 as q169 (key
      // exchanges on the certificate join sides if a stats drift
      // drops the ≤3-row broadcasts); observed below
      "q170_purged_top_sellers" -> 13,
      // q171 (round-17, audited at introduction): the streamed flow,
      // both consumers' durable folds, and the bounded vacuums are all
      // construction; the judged plan is two q167-shaped certificate
      // legs COLLAPSED to 1-row aggregates (per consumer: the report
      // scan's content rollup, the recompute leg's scan-agg, and the
      // ±1-weighted union-groupBy pair re-aggregated to the scalar
      // equiv sum), the metric explode unions, and the 14-row sort —
      // NO joins at all, so there is no broadcast for optimizer
      // weather to drop and the observed count IS the worst case
      "q171_multi_consumer_retention" -> 11,
      // q172 (round-17, audited at introduction): the q168 base flow,
      // the bootstrap materialization, both purge folds, and the
      // vacuum are all construction (durable writes truncate lineage);
      // the judged plan is the veteran's report scan joined to TWO
      // certificate legs — the newcomer-equiv pair (two report scans)
      // and the recompute-equiv pair (report scan + store scan-agg) —
      // plus the output sort: 6 observed, both assembly joins riding
      // stats-sized broadcasts of the equiv frames. Budget is the
      // hint-free worst case of 8 (the q163 lesson: key exchanges on
      // both certificate join sides if a stats drift drops them)
      "q172_consumer_bootstrap" -> 8,
      // q173 (round-17, audited at introduction): the flow store,
      // both resume folds, the compaction, and the vacuum are all
      // construction; the judged plan is q167's consumer shape — the
      // report scan joined to the recompute certificate leg via the
      // ±1-weighted union-groupBy pair, plus the output sort. Same
      // hint-free worst-case budget of 6 as q167/q168 (key exchanges
      // on both certificate join sides if a stats drift drops the
      // report-side broadcast); observed below
      "q173_compaction_maintenance" -> 6,
      // q174 (round-17, audited at introduction): identical judged
      // consumer shape to q173 (the evolution flow, all three folds,
      // and the vacuum are construction) — report scan ⋈ recompute
      // certificate leg via the ±1-weighted union-groupBy + output
      // sort. Same hint-free worst-case budget of 6; observed below
      "q174_evolution_maintenance" -> 6,
      // q175 (round-18, audited at introduction): both store builds and
      // every join fold are construction (the carried report and
      // affected frames are pinned per step), so the judged plan is the
      // pinned report scan joined to the recompute certificate leg —
      // orders store scan ⋈ projected inventories scan (the house-rule
      // shuffle join: the catalog side is corpus-proportional, no
      // broadcast hint) into the category rollup — via the ±1-weighted
      // union-groupBy pair, plus the ≤6-row sort. Budget is the
      // hint-free worst case of 8 (the q163 lesson: key exchanges on
      // the assembly-join sides if a stats drift drops the ≤6-row
      // broadcast); observed below
      "q175_maintained_join_report" -> 8,
      // q176 (round-18, audited at introduction): the streamed flow,
      // the late drain, and all three durable folds are construction
      // (each fold writes a report version — the durable write is the
      // lineage truncation), so the judged plan is q167's consumer
      // shape at the (product, year, month) key: the report table's
      // parquet scan joined to the recompute certificate leg's
      // scan-agg via the ±1-weighted union-groupBy pair, plus the
      // output sort. Same hint-free worst-case budget of 6 as
      // q167/q168 (key exchanges on both assembly sides if a stats
      // drift drops the report-side broadcast); observed below
      "q176_maintained_monthly" -> 6,
      // q177 (round-18, audited at introduction): both store flows,
      // all four durable folds, the vacuums, the in-query restart, and
      // the newcomer bootstrap are construction (durable writes
      // truncate lineage); the judged plan is the veteran's report
      // scan joined to TWO certificate legs — the newcomer-equiv pair
      // (two report scans) and the recompute-equiv pair (report scan +
      // the two-store scan ⋈ scan → category rollup) — plus the ≤6-row
      // sort: 6 observed, the assembly joins and the recompute join
      // riding stats-sized broadcasts. Budget is the hint-free worst
      // case of 10 (the q163 lesson: key exchanges on the three
      // dropped-broadcast join sides if stats drift)
      "q177_durable_join_resume" -> 10)
    // Where a budget is deliberately the HINT-FREE WORST CASE (q163,
    // q167, q168: the observed plan rides a stats-sized broadcast that
    // a stats/threshold drift may legitimately drop), a real plan
    // regression inside the query would also pass silently. Surface —
    // without failing on optimizer weather — any drift above the
    // HISTORICAL OBSERVED count recorded at audit time.
    val observedAtAudit = Map(
      "q163_store_report_cert" -> 2,
      "q167_durable_report_resume" -> 4,
      "q168_retention_safe_resume" -> 4,
      "q169_maintained_top_sellers" -> 9,
      "q170_purged_top_sellers" -> 9,
      "q172_consumer_bootstrap" -> 6,
      "q173_compaction_maintenance" -> 4,
      "q174_evolution_maintenance" -> 4,
      "q175_maintained_join_report" -> 2,
      "q176_maintained_monthly" -> 4,
      "q177_durable_join_resume" -> 6)
    budget.foreach { case (n, maxEx) =>
      val got = count(plan(n)) { case _: ShuffleExchangeExec => }
      assert(got <= maxEx, s"$n shuffles $got > budget $maxEx")
      observedAtAudit.get(n).filter(got > _).foreach { hist =>
        alert(s"$n shuffles $got exceed the audit-time observed $hist " +
          s"(budget $maxEx): either optimizer weather dropped the " +
          "stats-sized broadcast or a regression added an exchange — " +
          "read the plan before re-recording the observed count")
      }
    }
    // the worst-case-budgeted certificates are EXPECTED to ride a
    // broadcast at audit scale. Losing it is surfaced the same way as
    // the exchange-count drift — an ALERT, not a failure — because the
    // two tripwires watch the same event (a dropped broadcast adds
    // exchanges), and the whole point of the worst-case budget is that
    // stats/threshold drift must not fail CI; a real regression that
    // ADDS work still fails the hard budget above
    observedAtAudit.keys.foreach { n =>
      if (count(plan(n)) { case _: BroadcastHashJoinExec => } == 0)
        alert(s"$n lost its audit-scale broadcast join (same data and " +
          "thresholds as at audit time): read the plan — a Spark " +
          "stats-behavior change re-records the observed plan, a query " +
          "change is a regression")
    }
  }
}
