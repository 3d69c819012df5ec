package graft.state

import org.apache.spark.sql.DataFrame

/** Bucketed managed tables: pre-shuffled, co-located storage for the
  * joins that repeat across a workload.
  *
  * Two tables bucketed on their join keys with the same bucket count
  * join WITHOUT any Exchange — the shuffle is paid once at write time
  * and amortized over every subsequent join. At 100 TB this is the
  * difference between re-shuffling the fact table per query and never
  * shuffling it at all. (SortMergeJoin also skips its sort when the
  * buckets are `sortBy` the same keys.)
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      tableName: String,
      buckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(tableName)
}
