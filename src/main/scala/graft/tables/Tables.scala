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
    val tsIsNanos = {
      val inferred = scala.util.Try(spark.read.parquet(path).schema)
      // inference throwing IS the nanos signal (Spark rejects NANOS);
      // an inferred timestamp (TZ or NTZ — the corpus ships
      // isAdjustedToUTC=false, which surfaces as NTZ) means
      // micros/millis — plain read
      !inferred.toOption.exists(_.fields.exists(f => f.name == "ts" &&
        (f.dataType == TimestampType || f.dataType == TimestampNTZType)))
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
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
