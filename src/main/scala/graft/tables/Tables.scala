package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under `\$dir/`. All readers go through
  * here so that scan options stay uniform and predicate pushdown /
  * column pruning can be verified in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** `events.ts` has shipped in two parquet encodings across corpus
    * generations: TIMESTAMP(MICROS) (current — plain read works) and
    * TIMESTAMP(NANOS) (which Spark's schema inference rejects
    * outright). Sniff the footer's declared type for the one `ts`
    * column and pick the read path — a hardcoded assumption here turned
    * EVERY events-derived date into 1970 when the corpus regenerated
    * from nanos to micros (read as raw longs, micros were divided by
    * 1000 again). For the nanos variant, declaring the column as
    * `LongType` up-front makes the reader hand back the raw nanos with
    * NO session conf involved (the legacy `nanosAsLong` conf would have
    * to stay set for the lifetime of the plan and would silently retype
    * every later nano-timestamp read in the session); the corpus
    * carries no sub-microsecond values, so `div 1000` to micros is
    * lossless and matches what the DuckDB oracle sees.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val path = s"$dir/events.parquet"
    val tsIsNanos = eventsTsUnit(spark, path) match {
      case TsNanos           => true
      case TsMicros | TsMillis => false
    }
    if (!tsIsNanos)
      // normalize to TimestampType: the session TZ is pinned UTC, so the
      // NTZ→TZ cast is value-identity and every downstream consumer
      // (unix_micros, watermarks, window()) sees the one ts type the
      // engine is written against — same as the nanos path produces
      spark.read.parquet(path)
        .withColumn("ts", col("ts").cast(TimestampType))
    else {
      val raw = StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", LongType), // TIMESTAMP(NANOS) surfaced as raw nanos
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType)))
      spark.read.schema(raw).parquet(path)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    }
  }

  private sealed trait TsUnit
  private case object TsMillis extends TsUnit
  private case object TsMicros extends TsUnit
  private case object TsNanos extends TsUnit

  /** Read the parquet footer's DECLARED logical type for `ts` and branch
    * on it explicitly. The former heuristic ("schema inference threw ⇒
    * nanos") conflated two failure classes: a corrupt footer or
    * transient IO error would silently take the div-1000 path, and a
    * plain-INT64 micros column (no logical annotation) would too —
    * either way producing 1970-adjacent timestamps again. Anything other
    * than an annotated TIMESTAMP(MILLIS/MICROS/NANOS) now fails loudly
    * with the actual declared type in the message.
    */
  private def eventsTsUnit(spark: SparkSession, path: String): TsUnit = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val conf = spark.sessionState.newHadoopConf()
    // the corpus ships one physical file per table; tolerate a directory
    // layout by sniffing the first part file (all parts share a footer
    // schema when written by one job)
    val f = new java.io.File(path)
    val firstFile =
      if (f.isDirectory)
        f.listFiles().filter(p => p.getName.endsWith(".parquet") && p.isFile)
          .sortBy(_.getName).headOption
          .getOrElse(sys.error(s"events ts sniff: no parquet part files under $path"))
          .getPath
      else path
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(firstFile), conf))
    val ann =
      try reader.getFooter.getFileMetaData.getSchema.getType(Seq("ts"): _*)
        .asPrimitiveType().getLogicalTypeAnnotation
      finally reader.close()
    ann match {
      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => t.getUnit match {
        case TimeUnit.MILLIS => TsMillis
        case TimeUnit.MICROS => TsMicros
        case TimeUnit.NANOS  => TsNanos
      }
      case other => sys.error(
        s"events.ts: expected an annotated TIMESTAMP logical type in the parquet footer, " +
          s"got ${Option(other).map(_.toString).getOrElse("none (plain INT64?)")} at $firstFile — " +
          "refusing to guess an epoch unit")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
