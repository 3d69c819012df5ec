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
    * `spark.read.format("binaryFile")` over an object store).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(StringType).as("format"),
        length(col("text").cast(BinaryType)).cast(LongType).as("n_bytes")).as("meta"))

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
    * (binary `substring` slices), no UDF.
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
      .select(col("media_id"), col("kind"), col("frame_idx"), col("frame"))
  }
}
