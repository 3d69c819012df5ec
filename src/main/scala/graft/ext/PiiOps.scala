package graft.ext

import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.tables.Tables

/** PII scrubbing — the redaction pass every training-data pipeline runs
  * before text reaches a tokenizer (emails, phone numbers, id-like digit
  * runs). Extension family (not in the reference), judged like the rest.
  *
  * The synthetic corpus contains no digits, so the fixture follows the
  * q108 ImageGen pattern: PII is injected as a PURE FUNCTION of `doc_id`,
  * spelled identically in the Spark program and the DuckDB oracle —
  * every doc gains an email, every 3rd a phone, every 7th a 9-digit id.
  * The injection is shared fixture; what the gate actually judges is the
  * REAL machinery both engines then run independently: regex extraction
  * counts, chained redaction, and the two redaction proofs (byte delta
  * and a zero residual-match count over the redacted text).
  *
  * Dialect discipline (Java regex in Spark, RE2 in DuckDB): patterns
  * stick to the common subset — character classes, bounded repetition,
  * `\b` word boundaries; no lookaround, no backrefs. DuckDB
  * `regexp_replace` needs the `'g'` flag to match Spark's replace-all
  * default, and both `regexp_extract_all` calls pin group 0 explicitly
  * (Spark's default group is 1, DuckDB's is 0 — an implicit default
  * here would desync the engines on any parenthesized pattern).
  *
  * Scale: one embarrassingly-parallel scan — every regex op is a
  * codegen'd native expression (`RegExpExtractAll`/`RegExpReplace`, no
  * UDFs), partial aggregation happens map-side, and the only shuffle
  * carries 20 source-level rows. At 100 TB this is scan-bound, which is
  * exactly what a redaction pass should be.
  */
object PiiOps {

  private[ext] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[ext] val PhoneRe = "555-[0-9]{3}-[0-9]{4}"
  private[ext] val IdRe = "\\b[0-9]{9}\\b"

  /** q110: per-source PII scan + redaction audit. Columns: doc counts,
    * per-type match totals, the redaction byte delta, and `n_residual` —
    * docs still matching ANY pattern after redaction, which both engines
    * must agree is zero (the redaction-completeness proof).
    */
  val q110PiiRedaction: QuerySpec = QuerySpec(
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val aug = docs.select(col("source"),
        concat(
          coalesce(col("text"), lit("")),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" call 555-"),
              lpad(((col("doc_id") * 7) % 1000).cast("string"), 3, "0"),
              lit("-"),
              lpad(((col("doc_id") * 13) % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" ref "),
              lpad(((col("doc_id") * 37) % 1000000000L).cast("string"), 9, "0")))
            .otherwise(lit(""))).as("aug"))
      val scanned = aug.select(col("source"), col("aug"),
        size(regexp_extract_all(col("aug"), lit(EmailRe), lit(0))).as("n_email"),
        size(regexp_extract_all(col("aug"), lit(PhoneRe), lit(0))).as("n_phone"),
        size(regexp_extract_all(col("aug"), lit(IdRe), lit(0))).as("n_id"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("aug"), lit(EmailRe), lit("<EMAIL>")),
            lit(PhoneRe), lit("<PHONE>")),
          lit(IdRe), lit("<ID>")).as("red"))
      scanned.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_email") + col("n_phone") + col("n_id") > 0, 1L)
          .otherwise(0L)).as("n_docs_with_pii"),
        sum(col("n_email").cast("long")).as("n_emails"),
        sum(col("n_phone").cast("long")).as("n_phones"),
        sum(col("n_id").cast("long")).as("n_ids"),
        sum((length(col("aug")) - length(col("red"))).cast("long")).as("bytes_redacted"),
        sum(when(
          size(regexp_extract_all(col("red"), lit(EmailRe), lit(0)))
            + size(regexp_extract_all(col("red"), lit(PhoneRe), lit(0)))
            + size(regexp_extract_all(col("red"), lit(IdRe), lit(0))) > 0, 1L)
          .otherwise(0L)).as("n_residual"))
        .orderBy(col("source"))
    },
    """WITH aug AS (
      |  SELECT source,
      |         coalesce(text, '') || ' contact user' || cast(doc_id AS varchar) || '@example.com'
      |         || CASE WHEN doc_id % 3 = 0
      |                 THEN ' call 555-' || lpad(cast((doc_id * 7) % 1000 AS varchar), 3, '0')
      |                      || '-' || lpad(cast((doc_id * 13) % 10000 AS varchar), 4, '0')
      |                 ELSE '' END
      |         || CASE WHEN doc_id % 7 = 0
      |                 THEN ' ref ' || lpad(cast((doc_id * 37) % 1000000000 AS varchar), 9, '0')
      |                 ELSE '' END AS aug
      |  FROM documents),
      |scanned AS (
      |  SELECT source, aug,
      |         len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', 0)) AS n_email,
      |         len(regexp_extract_all(aug, '555-[0-9]{3}-[0-9]{4}', 0)) AS n_phone,
      |         len(regexp_extract_all(aug, '\b[0-9]{9}\b', 0)) AS n_id,
      |         regexp_replace(regexp_replace(regexp_replace(aug,
      |             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |             '555-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
      |             '\b[0-9]{9}\b', '<ID>', 'g') AS red
      |  FROM aug)
      |SELECT source, count(*) AS n_docs,
      |       cast(sum(CASE WHEN n_email + n_phone + n_id > 0 THEN 1 ELSE 0 END) AS bigint) AS n_docs_with_pii,
      |       cast(sum(n_email) AS bigint) AS n_emails,
      |       cast(sum(n_phone) AS bigint) AS n_phones,
      |       cast(sum(n_id) AS bigint) AS n_ids,
      |       cast(sum(length(aug) - length(red)) AS bigint) AS bytes_redacted,
      |       cast(sum(CASE WHEN
      |           len(regexp_extract_all(red, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', 0))
      |         + len(regexp_extract_all(red, '555-[0-9]{3}-[0-9]{4}', 0))
      |         + len(regexp_extract_all(red, '\b[0-9]{9}\b', 0)) > 0 THEN 1 ELSE 0 END) AS bigint) AS n_residual
      |FROM scanned GROUP BY source ORDER BY source""".stripMargin)

  val all: Map[String, QuerySpec] = Map(
    "q110_pii_redaction" -> q110PiiRedaction)
}
