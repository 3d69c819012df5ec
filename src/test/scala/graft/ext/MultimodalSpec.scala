package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.TestSpark
import graft.tables.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sfDir)

  // static plan (AQE off) so collect() sees the real operator tree, not
  // an AdaptiveSparkPlanExec wrapper — same approach as PlanAuditSpec
  private def staticPlan(df: => org.apache.spark.sql.DataFrame): SparkPlan = {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("binaryFile ingestion reproduces the corpus byte-for-byte") {
    val media = Multimodal.mediaFromBinaryFiles(spark, sfDir)
      .select(col("media_id"), md5(col("payload")).as("h_bin"),
        col("source").as("src_bin"), col("meta.n_bytes").as("nb"))
    val fromDocs = docs.select(col("doc_id").as("media_id"),
      md5(col("text").cast(BinaryType)).as("h_doc"), col("source"),
      length(col("text").cast(BinaryType)).cast(LongType).as("len"))
    val j = media.join(fromDocs, Seq("media_id"), "full_outer").cache()
    try {
      assert(j.filter(col("h_bin").isNull || col("h_doc").isNull).count() == 0,
        "binaryFile corpus and documents disagree on the id set")
      assert(j.filter(col("h_bin") =!= col("h_doc")).count() == 0, "payload bytes differ")
      assert(j.filter(col("src_bin") =!= col("source")).count() == 0, "source rider differs")
      assert(j.filter(col("nb") =!= col("len")).count() == 0, "n_bytes differs")
    } finally j.unpersist()
  }

  test("small blobs pack into bounded input splits (maxPartitionBytes)") {
    val nFiles = docs.count()
    val before = (spark.conf.get("spark.sql.files.maxPartitionBytes"),
      spark.conf.get("spark.sql.files.openCostInBytes"))
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (32 * 1024).toString)
      spark.conf.set("spark.sql.files.openCostInBytes", "1024")
      val n = Multimodal.mediaFromBinaryFiles(spark, sfDir).rdd.getNumPartitions
      // distributed (not one giant split) AND packed (not one tiny file
      // per split — the many-small-objects failure mode at 100 TB)
      assert(n > 1, s"all $nFiles blobs landed in one split")
      assert(n < nFiles, s"$nFiles blobs got $n splits — no packing")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", before._1)
      spark.conf.set("spark.sql.files.openCostInBytes", before._2)
    }
  }

  test("source predicate prunes staged partitions at the binaryFile scan") {
    val p = staticPlan(Multimodal.mediaFromBinaryFiles(spark, sfDir)
      .filter(col("source") === "src0"))
    val scan = p.collectFirst { case f: FileSourceScanExec => f }.get
    // the filter on the renamed rider column must reach the hive layout
    // as a partition filter (never opens other sources' files)
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "src")),
      s"no partition filter on src: ${scan.partitionFilters}")
  }

  test("q65 plan reads binaryFile and no shuffle carries a payload") {
    val p = staticPlan(Multimodal.q65FramesAccounting.run(spark, sfDir))
    assert(p.collect {
      case f: FileSourceScanExec
        if f.relation.fileFormat.getClass.getSimpleName == "BinaryFileFormat" => f
    }.nonEmpty, "q65 no longer scans binaryFile")
    val leaks = p.collect {
      case e: ShuffleExchangeExec if e.output.exists(_.dataType == BinaryType) => e
    }
    assert(leaks.isEmpty, s"binary payload crosses an exchange: $leaks")
  }

  test("q131 manifest: no shuffle carries a payload and no modality frame is broadcast-hinted") {
    // the manifest joins three REAL-decode legs by doc_id: every leg must
    // reduce to narrow scalar rows before its join (payloads die at the
    // codec boundary), and none of the doc-cardinality frames may carry
    // a forced broadcast hint — the planner alone decides sizes (the
    // q101 lesson; at corpus scale all three legs are corpus-sized)
    val df = Multimodal.q131MultimodalManifest.run(spark, sfDir)
    val leaks = staticPlan(df).collect {
      case e: ShuffleExchangeExec if e.output.exists(_.dataType == BinaryType) => e
    }
    assert(leaks.isEmpty, s"binary payload crosses an exchange: $leaks")
    val hinted = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.isEmpty, s"q131 forces broadcast hints: $hinted")
  }

  test("media table has the declared multimodal schema") {
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType == BinaryType)
    assert(media.schema("meta").dataType == Multimodal.metaType)
    assert(media.count() == docs.count())
  }

  test("real JDK decode fills typed metadata from PNG headers") {
    val media = Multimodal.imagesFromBinaryFiles(spark, sfDir)
    val decoded = Multimodal.withDecodedMeta(
      media.withColumn("kind", lit("image"))).cache()
    try {
      assert(decoded.count() == docs.count())
      assert(decoded.filter(col("meta.width").isNull).count() == 0)
      assert(decoded.filter(col("meta.format") =!= "png").count() == 0)
      // header dims are the generator's dims (8..16 by construction)
      assert(decoded.filter(
        col("meta.width") < 8 || col("meta.width") > 16 ||
          col("meta.height") < 8 || col("meta.height") > 16).count() == 0)
    } finally decoded.unpersist()
  }

  test("undecodable payloads keep NULL dims but real n_bytes") {
    val decoded = Multimodal.withDecodedMeta(Multimodal.mediaFromDocuments(docs)).cache()
    try {
      // raw text bytes: no installed reader claims them
      assert(decoded.filter(col("meta.width").isNotNull).count() == 0)
      assert(decoded.filter(col("meta.format").isNotNull).count() == 0)
      assert(decoded.filter(col("meta.n_bytes") =!=
        length(col("payload"))).count() == 0)
    } finally decoded.unpersist()
  }

  test("image audit recovers the generator's pixels through the codec alone") {
    // differential: every per-image number the mapPartitions codec path
    // reports must equal a direct JVM recompute from ImageGen arithmetic
    // (decode, channel sums, nn-half resize, and the PNG re-encode /
    // re-decode round trip all exact — PNG is lossless)
    val audited = Multimodal.imageAudit(spark, Multimodal.imagesFromBinaryFiles(spark, sfDir))
      .collect().map(a => a.media_id -> a).toMap
    assert(audited.size == docs.count())
    audited.values.foreach { a =>
      val d = a.media_id
      val (w, h) = (ImageGen.width(d), ImageGen.height(d))
      assert(a.width == w && a.height == h && a.format == "png", s"dims/format for $d")
      var (rs, gs, bs) = (0L, 0L, 0L)
      for (x <- 0 until w; y <- 0 until h) {
        rs += ImageGen.r(d, x, y); gs += ImageGen.g(d, x, y); bs += ImageGen.b(d, x, y)
      }
      assert((a.r_sum, a.g_sum, a.b_sum) == ((rs, gs, bs)), s"channel sums for $d")
      val (w2, h2) = (w / 2, h / 2)
      var (hrs, hgs, hbs) = (0L, 0L, 0L)
      for (x <- 0 until w2; y <- 0 until h2) {
        hrs += ImageGen.r(d, 2 * x, 2 * y); hgs += ImageGen.g(d, 2 * x, 2 * y)
        hbs += ImageGen.b(d, 2 * x, 2 * y)
      }
      assert(a.half_width == w2 && a.half_height == h2, s"half dims for $d")
      assert((a.half_r_sum, a.half_g_sum, a.half_b_sum) == ((hrs, hgs, hbs)),
        s"half channel sums for $d")
    }
  }

  test("q108 plan reads binaryFile and no shuffle carries a payload") {
    val p = staticPlan(Multimodal.q108ImageDecode.run(spark, sfDir))
    assert(p.collect {
      case f: FileSourceScanExec
        if f.relation.fileFormat.getClass.getSimpleName == "BinaryFileFormat" => f
    }.nonEmpty, "q108 no longer scans binaryFile")
    val leaks = p.collect {
      case e: ShuffleExchangeExec if e.output.exists(_.dataType == BinaryType) => e
    }
    assert(leaks.isEmpty, s"binary payload crosses an exchange: $leaks")
  }

  test("gif frame audit recovers the generator's frames through the codec alone") {
    // differential: per-(clip, frame) stats from the staged animated
    // GIFs must equal a direct JVM recompute from GifGen arithmetic —
    // frame COUNT (the multi-frame reader saw every frame), dims, the
    // exact gray sums (indexed grayscale + LZW = lossless), and the
    // r==g==b flag (the identity palette survived the container)
    import spark.implicits._
    val staged = Multimodal.stagedGifDir(spark, sfDir)
    val frames = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.gif").load(staged)
      .select(
        regexp_extract(col("path"), "/(\\d+)\\.gif$", 1).cast("long").as("media_id"),
        col("content").as("payload"))
      .as[(Long, Array[Byte])]
      .collect()
    assert(frames.length == docs.count())
    frames.foreach { case (d, payload) =>
      val imgs = JdkCodec.decodeGifFrames(payload)
      assert(imgs.size == GifGen.nFrames(d), s"frame count for $d")
      imgs.zipWithIndex.foreach { case (img, f) =>
        assert(img.getWidth == GifGen.width(d) && img.getHeight == GifGen.height(d),
          s"frame dims for clip $d frame $f")
        var expect = 0L; var got = 0L
        for (x <- 0 until img.getWidth; y <- 0 until img.getHeight) {
          expect += GifGen.gray(d, f, x, y)
          val p = img.getRGB(x, y)
          assert(((p >> 16) & 0xff) == ((p >> 8) & 0xff) && ((p >> 16) & 0xff) == (p & 0xff),
            s"non-gray pixel in clip $d frame $f — palette not preserved")
          got += (p >> 16) & 0xff
        }
        assert(got == expect, s"gray sum for clip $d frame $f")
      }
    }
  }

  test("q118 plan reads binaryFile and no shuffle carries a payload") {
    val p = staticPlan(Multimodal.q118GifFrames.run(spark, sfDir))
    assert(p.collect {
      case f: FileSourceScanExec
        if f.relation.fileFormat.getClass.getSimpleName == "BinaryFileFormat" => f
    }.nonEmpty, "q118 no longer scans binaryFile")
    val leaks = p.collect {
      case e: ShuffleExchangeExec if e.output.exists(_.dataType == BinaryType) => e
    }
    assert(leaks.isEmpty, s"binary payload crosses an exchange: $leaks")
  }

  test("q133 finds real near-dup structure, not a degenerate cluster") {
    // the oracle replays the signature arithmetic, so it would stay
    // green even if the generator degenerated (smooth-gradient bases
    // make EVERY image's dHash near-constant and the whole corpus one
    // cluster — the bug the xor-mixing exists to prevent). Pin the
    // properties the oracle cannot see: exact-signature dups AND
    // near-miss pairs both exist, and every judged pair is
    // within-family (cross-family signatures are far apart).
    val pairs = Multimodal.q133ImageNearDup.run(spark, sfDir).cache()
    try {
      val n = pairs.count()
      assert(n > 0, "q133 found no dup pairs at all")
      val nDocs = docs.count()
      assert(n < nDocs * (nDocs - 1) / 4,
        s"q133 flagged $n pairs — the corpus collapsed into one near-dup cluster")
      assert(pairs.filter(col("hamming") === 0).count() > 0,
        "no exact-signature dup pairs (uniform-brightness edits must be dHash-invariant)")
      assert(pairs.filter(col("hamming").between(1, 3)).count() > 0,
        "no near-miss pairs (spike edits must flip some gradient bits)")
      val crossFamily = pairs.filter(
        expr("media_id_a div 4") =!= expr("media_id_b div 4")).count()
      assert(crossFamily == 0,
        s"$crossFamily cross-family pairs within Hamming 3 — base images are not signature-diverse")
    } finally pairs.unpersist()
  }

  test("q133 plan: payloads die at the codec boundary, pairing is banded") {
    val p = staticPlan(Multimodal.q133ImageNearDup.run(spark, sfDir))
    val leaks = p.collect {
      case e: ShuffleExchangeExec if e.output.exists(_.dataType == BinaryType) => e
    }
    assert(leaks.isEmpty, s"binary payload crosses an exchange: $leaks")
    // every join in the plan must be a (band, v)-keyed equi-join or the
    // Hamming filter join — an unkeyed join here would be the all-pairs
    // O(n²) probe the banding exists to avoid
    val unkeyed = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec if j.leftKeys.isEmpty => j
    }
    assert(unkeyed.isEmpty, s"q133 contains an unkeyed (all-pairs) join: $unkeyed")
  }

  test("q135 finds real per-modality near-dup structure (no degenerate or empty leg)") {
    // the oracle replays all three signature chains, so it stays green
    // even if a generator degenerates (q133's smooth-gradient lesson).
    // Pin per modality: dups exist, exact AND near-miss pairs both
    // exist, and neither everything nor nothing is flagged.
    val rows = Multimodal.q135MultimodalNearDup.run(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "gif", "image"))
    rows.foreach { r =>
      val (mod, items, dups, exact, flagged) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dups > 0, s"$mod: no dup pairs")
      assert(exact > 0, s"$mod: no exact-signature pairs (invariant edit broke)")
      assert(exact < dups, s"$mod: no near-miss pairs (spike edits flip nothing)")
      // flagged can legitimately reach n_items (every family carries
      // signature-invariant-edit members, so most items have an exact
      // twin) — collapse is caught by the PAIR count staying far below
      // all-pairs, not by unflagged items existing
      assert(flagged > 0 && flagged <= items, s"$mod: flagged $flagged of $items items")
      assert(dups < items * (items - 1) / 4, s"$mod: corpus collapsed into one cluster")
    }
  }

  test("q135 plan: payloads die at the codec boundaries, pairing is banded") {
    val p = staticPlan(Multimodal.q135MultimodalNearDup.run(spark, sfDir))
    val leaks = p.collect {
      case e: ShuffleExchangeExec if e.output.exists(_.dataType == BinaryType) => e
    }
    assert(leaks.isEmpty, s"binary payload crosses an exchange: $leaks")
    val unkeyed = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.leftKeys.isEmpty && !j.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec] => j
    }
    assert(unkeyed.isEmpty, s"q135 contains an unkeyed non-scalar join: $unkeyed")
    // The pairing itself now runs behind the pair pin, so the final plan
    // above no longer contains it — audit the keyed pairing plan directly.
    // The tag must be DATA-DERIVED: a foldable lit() tag gets constant-
    // folded out of the grouping/join keys and the audit would inspect
    // the Nil-key plan while claiming to audit the keyed one.
    val sigs = Multimodal.imageSigFrame(spark, sfDir)
    val tagged = sigs.select(
      when(pmod(col("media_id"), lit(2L)) === 0L, "even").otherwise("odd").as("modality"),
      col("media_id"), col("sig"))
    val pp = staticPlan(Multimodal.hammingDupPairs(tagged, Seq("modality")))
    val ppUnkeyed = pp.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec if j.leftKeys.isEmpty => j
    }
    assert(ppUnkeyed.isEmpty, s"keyed pairing contains an unkeyed (all-pairs) join: $ppUnkeyed")
    // and the pairing join itself must carry all three keys — a
    // regression dropping keyCols from the join would leave (band, v)
    val fullyKeyed = pp.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec if j.leftKeys.size >= 3 => j
    }
    assert(fullyKeyed.nonEmpty,
      s"no (modality, band, v)-keyed join in the keyed pairing plan:\n$pp")
  }

  test("modality-keyed pairing ≡ per-family pairing (families never cross)") {
    // q135 runs all three modalities through ONE (modality, band, v)-keyed
    // pairing pass; prove on real signature frames that this equals the
    // Nil-key pairing run once per family. Family 'y' is the WORST-CASE
    // cross-family bait: identical signatures under disjoint ids, so every
    // y item is an exact (Hamming-0, same band buckets) twin of an x item —
    // a broken modality key would emit the cross pairs loudly, where a
    // merely perturbed second family could fail to collide and hide it.
    val x = Multimodal.imageSigFrame(spark, sfDir)
    val shift = 1000000L
    val y = x.select((col("media_id") + shift).as("media_id"), col("sig"))
    def tag(m: String, df: org.apache.spark.sql.DataFrame) =
      df.select(lit(m).as("modality"), col("media_id"), col("sig"))
    val keyed = Multimodal.hammingDupPairs(tag("x", x).unionAll(tag("y", y)), Seq("modality"))
      .orderBy(col("modality"), col("media_id_a"), col("media_id_b")).collect().toSeq
    val perFamily = (Multimodal.hammingDupPairs(x).select(lit("x").as("modality"), col("*"))
        unionAll Multimodal.hammingDupPairs(y).select(lit("y").as("modality"), col("*")))
      .orderBy(col("modality"), col("media_id_a"), col("media_id_b")).collect().toSeq
    assert(keyed.nonEmpty, "equivalence is vacuous: keyed pairing found no pairs")
    assert(keyed == perFamily,
      s"keyed pairing diverged from per-family pairing: ${keyed.size} vs ${perFamily.size} rows")
  }

  test("bucket cap is modality-scoped: combined-over-cap buckets survive per family") {
    // The corpus bait above cannot catch a cap regression that groups the
    // bucket-cap rollup by (band, v) only: the corpus canary pins buckets
    // to <= cap/2, so even doubled counts stay under the cap. Engineer the
    // case directly — two exact-twin families of 40 constant signatures:
    // per-family buckets hold 40 <= 64 (kept), combined they hold 80 > 64
    // (dropped by a mis-scoped cap). Correct code pairs each family fully.
    import spark.implicits._
    val n = 40
    val fx = (0 until n).map(i => ("x", i.toLong, 12345L))
    val fy = (0 until n).map(i => ("y", 1000L + i, 12345L))
    assert(2 * n > Multimodal.DHashBucketCap && n <= Multimodal.DHashBucketCap,
      "bait must straddle the cap: per-family under, combined over")
    val tagged = (fx ++ fy).toDF("modality", "media_id", "sig")
    val pairs = Multimodal.hammingDupPairs(tagged, Seq("modality"))
      .groupBy(col("modality")).agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = n.toLong * (n - 1) / 2
    assert(pairs == Map("x" -> full, "y" -> full),
      s"modality-scoped cap broken: expected $full pairs per family, got $pairs")
  }

  test("q137's bounded streaming state never saturates: dHash buckets stay far under the cap") {
    // the streaming operator now mirrors the batch cap exactly (a
    // saturated bucket tombstones all its flags — equivalence holds
    // even over the cap, spec-proven in StreamingNearDupSpec), so this
    // pin is a corpus-drift canary rather than a soundness guard: a
    // bucket within 2x of the cap means the dHash space is degenerating
    // toward mega-buckets and candidate recall is about to collapse.
    val sigs = Multimodal.imageSigFrame(spark, sfDir)
    val maxBucket = Multimodal.dhashBandRows(sigs)
      .groupBy(col("band"), col("v")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxBucket <= Multimodal.DHashBucketCap / 2,
      s"largest dHash bucket $maxBucket is within 2x of the cap ${Multimodal.DHashBucketCap}")
    // and the streaming rollup actually flags something
    val flagged = graft.streaming.StreamingQueries.q137StreamingImageNearDup
      .run(spark, sfDir).agg(sum(col("n_neardup"))).head().getLong(0)
    assert(flagged > 0, "q137 flagged nothing")
  }

  test("q153 purge accounting is non-vacuous on the judged corpus") {
    // the oracle replays the purge predicate, so a corpus drift that
    // empties the purge set — or stops any purge from intersecting the
    // near-dup structure — would stay green while certifying nothing.
    // Pin: purges happen, at least one SURVIVOR loses its flag (the
    // retraction leg), at least one purged doc was itself flagged pre
    // (the own-flag netting leg), and the equivalence certificate holds.
    val rows = graft.streaming.StreamingQueries.q153StreamingNearDupPurge
      .run(spark, sfDir)
      .agg(sum(col("n_purged")), sum(col("n_retracted")),
        sum(col("n_neardup_pre") - col("n_neardup_post")), sum(col("equiv_diff")))
      .head()
    assert(rows.getLong(0) > 0, "no docs purged")
    assert(rows.getLong(1) > 0, "no surviving doc was retracted — purge never hit a flag's justification")
    // pre-post delta exceeding retractions means some purged doc was
    // itself flagged pre (its own flag netted to zero)
    assert(rows.getLong(2) > rows.getLong(1), "no purged doc was itself flagged pre")
    assert(rows.getLong(3) == 0, s"streamed/batch equivalence broken: ${rows.getLong(3)}")
  }

  test("q139 admission verdicts are non-vacuous: every verdict class occurs") {
    // the oracle replays the same screen, so a boundary drifting back
    // onto the 4-id family alignment would zero the corpus screen while
    // staying green — pin all three verdict classes as genuinely
    // populated on this corpus
    val sums = Multimodal.q139ImageShardAdmission.run(spark, sfDir)
      .agg(sum(col("n_incoming")), sum(col("n_dup_corpus")),
        sum(col("n_dup_shard_only")), sum(col("n_new"))).head()
    assert(sums.getLong(0) > 0, "no incoming shard")
    assert(sums.getLong(1) > 0, "corpus screen found nothing (boundary re-aligned with families?)")
    assert(sums.getLong(2) > 0, "no within-shard duplicates")
    assert(sums.getLong(3) > 0, "no new images at all")
  }

  test("feature extraction yields normalized fixed-width float vectors") {
    val feats = Multimodal.withFeatures(Multimodal.mediaFromDocuments(docs)).cache()
    assert(feats.schema("features").dataType == ArrayType(FloatType, containsNull = false))
    val row = feats.select(col("features")).head().getSeq[Float](0)
    assert(row.length == 16)
    assert(math.abs(row.sum - 1.0f) < 1e-3)
  }

  test("media features compose with the similarity operators") {
    // the promised contract: stub features are shaped like embeddings,
    // so VectorOps-style cosine runs on them unchanged
    val feats = Multimodal.withFeatures(Multimodal.mediaFromDocuments(docs))
      .select(col("media_id"), col("features"))
    val q = feats.filter(col("media_id") < 3)
      .select(col("media_id").as("q_id"), col("features").as("qv"))
    val c = feats.select(col("media_id").as("c_id"), col("features").as("cv"))
    // the REAL VectorOps expressions, not a copy — this is the contract
    val scored = c.crossJoin(broadcast(q)).filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        VectorOps.dot(spark, "qv", "cv") / (sqrt(VectorOps.norm2(spark, "qv")) * sqrt(VectorOps.norm2(spark, "cv"))))
    val top = scored.groupBy("q_id")
      .agg(max(col("cosine")).as("best"))
      .collect()
    assert(top.length == 3)
    // histograms of same-vocabulary text are highly similar but not NaN/degenerate
    assert(top.forall(r => r.getDouble(1) > 0.5 && r.getDouble(1) <= 1.0 + 1e-9))
  }

  test("frame sampling yields zero frames for NULL or empty payloads") {
    import spark.implicits._
    val media = Seq(
      (1L, Option("abcd"), Option(4L)),    // 2 frames of 2 bytes
      (2L, Option(""), Option(0L)),        // empty payload -> 0 frames
      (3L, Option.empty[String], Option.empty[Long])) // null payload/meta -> 0 frames
      .toDF("media_id", "text", "n_bytes")
      .select(
        col("media_id"), lit("image").as("kind"),
        col("text").cast(BinaryType).as("payload"),
        struct(
          lit(null).cast(IntegerType).as("width"),
          lit(null).cast(IntegerType).as("height"),
          lit(null).cast(StringType).as("format"),
          col("n_bytes")).as("meta"))
    val frames = Multimodal.sampledFrames(media, frameBytes = 2, maxFrames = 4)
      .select("media_id", "frame_idx").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(frames == Set((1L, 0), (1L, 1)))
  }

  test("frame sampling explodes bounded fixed-size slices") {
    val media = Multimodal.withDecodedMeta(Multimodal.mediaFromDocuments(docs))
    val frames = Multimodal.sampledFrames(media, frameBytes = 64, maxFrames = 4).cache()
    assert(frames.columns.toSeq == Seq("media_id", "kind", "frame_idx", "frame"))
    val perDoc = frames.groupBy("media_id").count()
    assert(perDoc.filter(col("count") > 4).count() == 0)
    // every frame except possibly the last is exactly 64 bytes
    assert(frames.filter(length(col("frame")) > 64).count() == 0)
  }

  test("audio frame-sampling reconciles with the clip-level decode accounting") {
    // q126's frames must cover every decoded sample exactly once: per
    // source, the frame-level sample totals fold back to q114's
    // clip-level totals, and the frame_idx=0 row counts every clip
    // (every staged clip has ≥256 samples ≥ one frame). Cross-operator
    // consistency the per-query oracles can't see.
    val frames = Multimodal.q126AudioFrames.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val clips = Multimodal.q114AudioDecode.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val frameTotals = frames.groupBy(_._1).map { case (s0, xs) => s0 -> xs.map(_._4).sum }
    val clipTotals = clips.map { case (s0, _, tot) => s0 -> tot }.toMap
    assert(frameTotals == clipTotals,
      s"frame sample totals $frameTotals != clip totals $clipTotals")
    val f0 = frames.filter(_._2 == 0).map(x => x._1 -> x._3).toMap
    val nClips = clips.map { case (s0, n, _) => s0 -> n }.toMap
    assert(f0 == nClips, s"frame_idx=0 counts $f0 != clip counts $nClips")
  }
}
