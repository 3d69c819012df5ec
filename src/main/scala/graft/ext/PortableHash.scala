package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable md5 bucketing — the one hash scheme shared by every
  * operator that needs a *numeric* deterministic bucket (Count-Min rows
  * q49, stratified sampling q53, pipeline sampling q59), so the formula
  * cannot drift between operators or between an operator and its oracle.
  */
private[graft] object PortableHash {

  /** Bucket in [0, 16^hexChars) from md5(e) — codegen'd `conv`. */
  def bucketCol(e: Column, hexChars: Int): Column =
    conv(substring(md5(e), 1, hexChars), 16, 10).cast("int")

  /** DuckDB twin over the SQL expression `e` (DuckDB has no conv;
    * positional strpos arithmetic over the hex chars is exact).
    */
  def bucketSql(e: String, hexChars: Int): String =
    (0 until hexChars).map(i =>
      s"(strpos('0123456789abcdef', substr(md5($e), ${i + 1}, 1)) - 1) * ${math.pow(16, hexChars - 1 - i).toLong}")
      .mkString(" + ")

  /** Numeric value of hex chars [start, start+hexChars) of an ALREADY-hex
    * string column (e.g. a stored md5 fingerprint) — lets one stored hash
    * yield several independent bucket coordinates (q142's Bloom positions)
    * without rehashing. hexChars ≤ 14 keeps the value inside the 56-bit
    * window that survives DuckDB HUGEINT→BIGINT casts exactly.
    */
  def hexSliceCol(e: Column, start: Int, hexChars: Int): Column = {
    require(hexChars <= 14, "hex slice must stay inside the 56-bit exact window")
    conv(substring(e, start, hexChars), 16, 10).cast("long")
  }

  /** DuckDB twin of [[hexSliceCol]] over the hex-string SQL expression `e`. */
  def hexSliceSql(e: String, start: Int, hexChars: Int): String =
    (0 until hexChars).map(i =>
      s"(strpos('0123456789abcdef', substr($e, ${start + i}, 1)) - 1) * ${math.pow(16, hexChars - 1 - i).toLong}")
      .mkString("(", " + ", ")")
}

/** Shared oracle-SQL fragments that keep the DuckDB twin's types aligned
  * with Spark's. DuckDB widens `sum(INTEGER/BIGINT)` to HUGEINT, which the
  * driver's comparison frame surfaces as float64 against Spark's int64 —
  * `rows_match`/`schema_match` pass but `hash_match` fails (the r5 verdict
  * adjudicated q79/q80/q85 exactly this way). Every integer sum in an
  * oracle string MUST go through [[OracleSql.bigSum]]; `OracleLintSpec`
  * scans the registry for violations.
  */
private[graft] object OracleSql {

  /** `cast(sum(e) AS bigint)` — the HUGEINT-proof integer sum. */
  def bigSum(e: String): String = s"cast(sum($e) AS bigint)"
}
