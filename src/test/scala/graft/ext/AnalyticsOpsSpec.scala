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

  test("z-order buckets are rectangles: every bucket's extents share one grid cell") {
    // The data-skipping claim behind q104: a bucket (top-3-bits of each
    // interleaved dimension) must cover ONE 8×8 grid cell, so its
    // min/max extents — what a scan planner reads — bound both
    // dimensions tightly. Oracle equality alone wouldn't catch a
    // semantically scrambled bucketing (both engines would scramble
    // identically), so the property is locked here from first
    // principles, recomputing the normalization off the raw table.
    import org.apache.spark.sql.functions._
    import graft.tables.Tables
    val out = AnalyticsOps.q104ZorderLayout.run(spark, sfDir).collect()
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("x"), floor(col("o_totalprice")).cast("long").as("y"))
    val Array(mnx, mxx, mny, mxy) =
      o.agg(min("x"), max("x"), min("y"), max("y")).head().toSeq.map(_.asInstanceOf[Long]).toArray
    def cell(v: Long, mn: Long, mx: Long): Long = ((v - mn) * 256) / (mx - mn + 1) / 32
    assert(out.length > 1, "single bucket — rectangle test is vacuous")
    out.foreach { r =>
      val (bucket, minC, maxC) = (r.getAs[Long]("bucket"), r.getAs[Long]("min_cust"), r.getAs[Long]("max_cust"))
      val (minP, maxP) = (r.getAs[Long]("min_price"), r.getAs[Long]("max_price"))
      assert(cell(minC, mnx, mxx) == cell(maxC, mnx, mxx),
        s"bucket $bucket spans x-cells ${cell(minC, mnx, mxx)}..${cell(maxC, mnx, mxx)}")
      assert(cell(minP, mny, mxy) == cell(maxP, mny, mxy),
        s"bucket $bucket spans y-cells ${cell(minP, mny, mxy)}..${cell(maxP, mny, mxy)}")
      // and the bucket id IS the interleave of its cell coordinates'
      // top bits: 3 x-bits at odd positions, 3 y-bits at even
      val (cx, cy) = (cell(minC, mnx, mxx), cell(minP, mny, mxy))
      val expected = (0 until 3).map(j => ((cx >> j) & 1) << (2 * j + 1) | ((cy >> j) & 1) << (2 * j)).sum
      assert(bucket == expected, s"bucket $bucket != interleave($cx,$cy)=$expected")
    }
  }

  test("vocab coverage curve matches the in-memory frequency walk") {
    // The distributed prefix-sum (range slices + offsets) must equal a
    // single-threaded walk down the frequency-sorted vocabulary.
    import org.apache.spark.sql.functions._
    import graft.tables.Tables
    val out = AnalyticsOps.q106VocabCoverage.run(spark, sfDir).collect()
      .map(r => r.getAs[Int]("coverage_pct") ->
        ((r.getAs[Long]("vocab_size"), r.getAs[Long]("covered_occurrences"), r.getAs[String]("boundary_token"))))
      .toMap
    val counts = Tables.documents(spark, sfDir).select(col("text")).collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }
    val totalOcc = counts.map(_._2).sum
    val expected = Seq(50, 75, 90, 99).map { pct =>
      var cum = 0L; var rank = 0L; var boundary = ""
      val it = counts.iterator
      while (cum * 100 < pct * totalOcc && it.hasNext) {
        val (w, c) = it.next(); cum += c; rank += 1; boundary = w
      }
      pct -> ((rank, cum, boundary))
    }.toMap
    // non-trivial curve: the 99% vocab must be strictly larger than the 50% one
    assert(expected(99)._1 > expected(50)._1, "degenerate frequency distribution")
    assert(out == expected, s"got $out, want $expected")
  }

  test("q109 staged z-layout writes exactly one file per bucket") {
    // "files touched" and "buckets surviving the index" must coincide
    // for the judged counts to BE file counts — locked here against the
    // physically written layout, not the intent
    import org.apache.spark.sql.functions._
    val stage = AnalyticsOps.zorderStage(spark, sfDir)
    for (sub <- Seq("z", "linear")) {
      val bucket = if (sub == "z") "zbucket" else "lbucket"
      val fpb = spark.read.parquet(s"$stage/$sub")
        .withColumn("f", input_file_name())
        .groupBy(col(bucket)).agg(countDistinct(col("f")).as("nf"))
      assert(fpb.filter(col("nf") =!= 1).count() == 0, s"$sub: multi-file bucket")
    }
  }

  test("index-selected buckets physically prune the partitioned scan") {
    // The production skipping loop: the planner consults the per-file
    // extent index (driver-side — the index is N_files rows, never
    // data-sized), plans the scan over surviving buckets only, and the
    // scan opens strictly fewer files. Probe: the price strip yi<=31,
    // which a linear customer sort cannot prune at all.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    val stage = AnalyticsOps.zorderStage(spark, sfDir)
    val zIdx = spark.read.parquet(s"$stage/z_index")
    val survivors = zIdx.filter(col("mnyi") <= 31).select("zbucket")
      .collect().map(_.getInt(0)).sorted // test-side planning step
    val nBuckets = zIdx.count()
    assert(survivors.length < nBuckets, "probe survives every bucket — vacuous")
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pruned = spark.read.parquet(s"$stage/z")
        .filter(col("zbucket").isin(survivors.toIndexedSeq.map(Integer.valueOf): _*) && col("yi") <= 31)
      val qe = pruned.queryExecution
      val scan = qe.executedPlan.collectFirst { case f: FileSourceScanExec => f }.get
      assert(scan.partitionFilters.nonEmpty, "bucket predicate missed the partition layout")
      val prunedRows = pruned.collect().length // executes THIS qe → metrics live
      assert(scan.metrics("numFiles").value == survivors.length.toLong,
        s"opened ${scan.metrics("numFiles").value} files, expected ${survivors.length}")
      // and the pruned answer is the full answer
      val full = spark.read.parquet(s"$stage/z").filter(col("yi") <= 31).count()
      assert(prunedRows.toLong == full, "pruning lost rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("z-layout touches strictly fewer files than the linear layout") {
    val out = AnalyticsOps.q109ZorderPrune.run(spark, sfDir).collect()
      .map(r => r.getAs[Int]("probe_id") ->
        ((r.getAs[Long]("files_z"), r.getAs[Long]("files_lin"), r.getAs[Long]("rows_matched"))))
      .toMap
    assert(out.size == AnalyticsOps.PruneProbes.size)
    // price-only probes: the linear layout cannot prune, z can
    for (pid <- Seq(2, 5)) {
      val (fz, fl, _) = out(pid)
      assert(fz < fl, s"probe $pid: z touched $fz, linear $fl — no win")
    }
    // full-range sanity probe reads everything under both layouts
    val (fz6, fl6, _) = out(6)
    assert(fz6 == fl6, s"full-range probe asymmetric: $fz6 vs $fl6")
    // aggregate: z strictly cheaper across the probe set
    val totZ = out.values.map(_._1).sum
    val totL = out.values.map(_._2).sum
    assert(totZ < totL, s"z total $totZ !< linear total $totL")
  }

  test("mixing schedule matches a driver-side replay of the recipe arithmetic") {
    // Third engine for q127: the oracle gate proves Spark == DuckDB;
    // this replays the whole schedule — priorities, grouped prefix
    // sums, allocations, epochs, partial cut — in plain JVM arithmetic
    // straight off the documents table, so an error SHARED by both SQL
    // formulations (e.g. a misstated budget or cut rule) still fails.
    import graft.tables.Tables
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def pri(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"epoch:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      Integer.parseInt(hex.substring(0, 4), 16)
    }
    val toks = docs.map { case (id, src, text) =>
      (src, id, pri(id), text.trim.split("\\s+").length.toLong)
    }
    val bySrc = toks.groupBy(_._1)
    val t = toks.map(_._4).sum
    val srcs = bySrc.keys.toSeq.sorted
    val weights = srcs.zipWithIndex.map { case (s0, i) => s0 -> (i + 1).toLong }.toMap
    val sw = weights.values.sum
    val expected = srcs.map { s0 =>
      val rows = bySrc(s0)
      val ti = rows.map(_._4).sum
      val w = weights(s0)
      val alloc = w * 2 * t / sw
      val (epochs, rem) = (alloc / ti, alloc % ti)
      var cum = 0L; var nDocs = 0L; var partTok = 0L
      rows.sortBy(r => (r._3, r._2)).foreach { r =>
        cum += r._4
        if (cum <= rem) { nDocs += 1; partTok = cum }
      }
      (s0, w, ti, alloc, epochs, rem, nDocs, partTok)
    }
    val got = AnalyticsOps.q127MixingSchedule.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == expected, s"schedule mismatch:\n got=${got.toSeq}\n exp=$expected")
  }

  test("q149 rebalance proof: bounded movement, only onto the new shard, mass conserved") {
    // the oracle replays the ring arithmetic; it cannot see the RING
    // degenerating (one vnode capturing everything keeps hashes green
    // while the 1/(N+1) guarantee quietly dies). Pin the guarantees the
    // query exists to demonstrate.
    val rows = AnalyticsOps.q149ConsistentHashing.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val n = rows.head._5
    val movedC = rows.head._6
    val movedN = rows.head._7
    assert(rows.map(_._2).sum == n && rows.map(_._3).sum == n, "key mass not conserved")
    // consistent: ≈ 1/(N+1) of keys move (allow 2×); naive: ≈ N/(N+1) (require > 0.7)
    assert(movedC * 5 < 2 * n, s"consistent rebalance moved $movedC of $n — ring degenerated")
    assert(movedC > 0L, "nothing moved — the new shard captured no ranges")
    assert(movedN * 10 > 7 * n, s"naive mod-N moved only $movedN of $n")
    // keys move ONLY onto the new shard — never between surviving shards
    rows.filter(_._1 < 4).foreach { r =>
      assert(r._4 == 0L, s"shard ${r._1} received moved keys — not a consistent ring")
    }
    assert(rows.find(_._1 == 4).get._4 == movedC, "new shard's inflow != total moved")
  }

  test("q150 merkle diff localizes: level counts match the engineered edit set") {
    // the oracle replays the same tree; it cannot see LOCALIZATION
    // breaking (a bucket hash ignoring its members would still match its
    // own replay while the tree stops finding edits). Pin the geometry
    // against the generator's ground truth computed here from doc_ids.
    val ids = graft.tables.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val edited = ids.filter(_ % 101 == 7)
    val touchedBuckets = edited.map(_ / 64).toSet
    val bucketSizes = ids.groupBy(_ / 64).view.mapValues(_.length.toLong).toMap
    val rows = AnalyticsOps.q150MerkleDiff.run(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(edited.nonEmpty, "edit set empty — generator degenerated")
    assert(rows(0) == ((ids.length.toLong, edited.length.toLong, edited.length.toLong)))
    assert(rows(1) == ((bucketSizes.size.toLong, touchedBuckets.size.toLong,
      touchedBuckets.toSeq.map(bucketSizes).sum)))
    assert(rows(2) == ((1L, 1L, ids.length.toLong)))
    // the curve's point: bucket-level sync transfers less than the root
    assert(rows(1)._3 < rows(2)._3 && rows(0)._3 < rows(1)._3)
  }

  test("q132 rank-quality flag is non-degenerate (flags some docs, never all)") {
    // the oracle gate proves the counts match DuckDB; it cannot see the
    // threshold silently degenerating (corpus drift pushing every mean
    // rank to one side of RankT would keep hashes green while the
    // filter stops discriminating). Pin 0 < flagged < docs, per corpus.
    val rows = AnalyticsOps.q132RankQuality.run(spark, sfDir).collect()
    val flagged = rows.map(_.getLong(2)).sum
    val docs = rows.map(_.getLong(1)).sum
    assert(docs > 0L)
    assert(flagged > 0L, "rank-quality filter flags nothing — threshold degenerated low")
    assert(flagged < docs, "rank-quality filter flags everything — threshold degenerated high")
  }

  test("q152: threshold churn zero, cap churn real, brute-force selection parity") {
    val rows = AnalyticsOps.q152SamplingStability.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // proof columns: threshold sampling NEVER churns (per-key decision),
    // and the cap must both BIND (else the judged row is a vacuous
    // n == kept identity) and actually evict somewhere (else the
    // before/after comparison proves nothing on this corpus). The
    // oracle replays the same generator, so only this spec sees these.
    rows.foreach { r =>
      assert(r.getAs[Long]("thr_evicted") == 0L, s"threshold sampler churned: $r")
      assert(r.getAs[Long]("cap_kept_base") == 16L, s"cap does not bind: $r")
    }
    assert(rows.map(_.getAs[Long]("cap_evicted")).sum > 0L,
      "cap eviction proof is vacuous — no source lost a member to the shard")
    val thrTot = rows.map(_.getAs[Long]("thr_kept_base")).sum
    val nTot = rows.map(_.getAs[Long]("n_base")).sum
    assert(thrTot > 0L && thrTot < nTot,
      "threshold sampler must keep a non-trivial strict subset")
    // independent brute force: recompute both selections in memory (JVM
    // MD5, plain sorts) and compare the churn counts and the
    // selection-sensitive token sums — proves the TopKCarry negation +
    // tie-break wiring against a second implementation, which oracle
    // equality cannot (both engines share the SQL formulation)
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def pri(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"sample:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }
    def tok(t: String): Long = t.trim.split("\\s+").length.toLong
    val base = docs.map { case (id, s, t) => (id, s, tok(t), pri(id)) }
    val shard =
      docs.filter(_._1 % 7 < 2).map { case (id, s, t) =>
        (id + 10000000L, s, tok(t), pri(id + 10000000L)) } ++
      docs.filter(_._1 % 7 == 2).map { case (id, s, t) =>
        (id + 20000000L, s, tok(t + " rev2"), pri(id + 20000000L)) }
    def kept(xs: Array[(Long, String, Long, Long)]): Map[String, Set[Long]] =
      xs.groupBy(_._2).map { case (src, ys) =>
        src -> ys.sortBy(y => (y._4, y._1)).take(16).map(_._1).toSet }
    val kb = kept(base)
    val ka = kept(base ++ shard)
    val toks = (base ++ shard).map(x => x._1 -> x._3).toMap
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Long]("cap_evicted") == (kb(src) -- ka(src)).size.toLong,
        s"$src: cap eviction count diverges from brute force")
      assert(r.getAs[Long]("cap_tokens_base") == kb(src).toSeq.map(toks).sum,
        s"$src: kept-set token sum diverges from brute force")
      assert(r.getAs[Long]("cap_tokens_app") == ka(src).toSeq.map(toks).sum,
        s"$src: appended kept-set token sum diverges from brute force")
    }
  }
}
