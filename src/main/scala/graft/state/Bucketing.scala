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
      keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    // A previous SESSION's table data can survive in the warehouse dir
    // while being absent from this session's in-memory catalog — then
    // saveAsTable treats the write as a CREATE and refuses the existing
    // location. Drop the catalog entry if present AND remove any
    // orphaned location before writing.
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val whRaw = spark.conf.get("spark.sql.warehouse.dir")
    val whPath: Option[java.nio.file.Path] =
      if (whRaw.startsWith("file:"))
        // Paths.get(URI) decodes percent-encoding (a raw stripPrefix
        // would keep %20 etc. and miss the stale dir); a user-set conf
        // may hold a RAW path after "file:" (spaces, lone %) that URI
        // rejects — fall back to the literal path for those
        scala.util.Try(java.nio.file.Paths.get(new java.net.URI(whRaw))).toOption
          .orElse(Some(java.nio.file.Paths.get(whRaw.stripPrefix("file:"))))
      else if (!whRaw.contains(":")) Some(java.nio.file.Paths.get(whRaw))
      else None // non-local warehouse: nothing to clean on the local fs
    whPath.map(_.resolve(tableName.toLowerCase))
      .filter(java.nio.file.Files.exists(_))
      .foreach(graft.core.Fs.deleteRecursively)
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(tableName)
  }
}
