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
}
