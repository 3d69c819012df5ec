package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schemas

/** CSV ingestion + cleaning (SURVEY.md §2.1 S1/S2, §2.2 P1–P5) as pure
  * `DataFrame => DataFrame` normalizations — whole-column expressions, no
  * row iteration, so the same code path handles 3k rows or 100 TB of
  * landed CSV (each file parses in its own task; no shuffle).
  *
  * Cleaning contract (reference parity):
  *  - headers renamed camelCase → snake_case (`flows/utils.py:4–5`)
  *  - empty strings → NULL (pandas `NaN → None`,
  *    `flows/data_ingestion.py:109–112`) via the reader's `nullValue`
  *  - `date_time` parsed from both ISO-8601 variants
  *    (`flows/data_ingestion.py:86–91`)
  *  - ids kept as strings (`flows/data_ingestion.py:74–76, 93–94`)
  */
object Ingest {

  /** Reference retry policy for ingest actions (R1: retries=3, 5 s —
    * i.e. 1 initial try + 3 retries = 4 attempts).
    */
  def retried[A](f: => A): A = Retry.withRetries(attempts = 4, delayMillis = 5000L)(f)

  private def renamed(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(Schemas.camelToSnake).toIndexedSeq: _*)

  /** S1: read + normalize orders CSV(s). `path` may be a file, directory,
    * or glob — at scale a landing directory of many files.
    */
  def readOrdersCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .schema(Schemas.ordersRaw)
      .option("header", "true")
      .option("nullValue", "")
      .option("emptyValue", "")
      .csv(path)
    normalizeOrders(raw)
  }

  /** Normalization applied to raw orders (also used by the streaming
    * source — batch/stream share one code path).
    */
  def normalizeOrders(raw: DataFrame): DataFrame =
    renamed(raw)
      .withColumn("date_time", Schemas.parseDateTime(col("date_time")))

  /** S2: read + normalize inventory CSV(s). */
  def readInventoriesCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .schema(Schemas.inventoryRaw)
      .option("header", "true")
      .option("nullValue", "")
      .option("emptyValue", "")
      .csv(path)
    renamed(raw)
  }

  /** JSON-Lines source with the same cleaning contract as the CSV
    * readers: declared schema (never inference — at 100 TB a schema
    * inference pass is a full extra read), camelCase keys renamed, rows
    * that don't parse preserved in `_corrupt_record` instead of silently
    * dropped. Parsed as text + `from_json` rather than the json reader:
    * the reader's corrupt column carries a query restriction
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN forbids filtering on it without
    * caching first), while this form yields an ordinary queryable
    * column. Line-splittable text input ⇒ parallel scan, no shuffle.
    */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains("_corrupt_record")) schema
      else schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val parsed = spark.read.text(path)
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
      .select(col("r.*"))
    renamed(parsed)
  }
}
