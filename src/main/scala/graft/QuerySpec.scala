package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One judged query: a Spark program plus (optionally) an equivalent ANSI
  * SQL text for the DuckDB oracle. `oracle == None` ⇒ the operator is not
  * SQL-expressible (e.g. LSH bucketing with engine-specific hashes) and
  * the driver falls back to a rows-only check.
  */
final case class QuerySpec(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def apply(run: (SparkSession, String) => DataFrame, sql: String): QuerySpec =
    QuerySpec(run, Some(sql))
}
