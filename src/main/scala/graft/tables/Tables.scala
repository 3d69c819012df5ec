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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's schema
    * inference rejects outright. Declaring the column as `LongType`
    * up-front makes the reader hand back the raw nanos with NO session
    * conf involved (the legacy `nanosAsLong` conf would have to stay set
    * for the lifetime of the plan and would silently retype every later
    * nano-timestamp read in the session). Convert to a micro-precision
    * timestamp: the corpus carries no sub-microsecond values, so this is
    * lossless and matches what the DuckDB oracle sees.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType), // TIMESTAMP(NANOS) surfaced as raw nanos
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    spark.read.schema(raw).parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
