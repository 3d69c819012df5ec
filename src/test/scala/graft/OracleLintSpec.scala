package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide lint over `SparkEntry.oracleSql`: DuckDB widens
  * `sum(INTEGER/BIGINT)` to HUGEINT, which surfaces as float64 in the
  * driver's comparison frame against Spark's int64 — `hash_match=false`
  * with rows/schema green (the round-5 q79/q80/q85 failure mode). The rule
  * this enforces: every `sum(...)` whose argument is integer-valued must
  * be wrapped as `cast(sum(...) AS bigint)` (optionally through a
  * `coalesce`), i.e. built with `OracleSql.bigSum`. Sums over double
  * columns (l_quantity, o_totalprice, value, ...) or over expressions
  * already widened via an inner `cast(... AS decimal/double)` are exempt —
  * DuckDB and Spark agree on those types.
  */
class OracleLintSpec extends AnyFunSuite {

  /** Integer-typed identifiers: base parquet columns (int32/int64 in
    * TESTDATA.md schemas) plus integer-valued CTE aliases our oracles
    * define (counts, 0/1 flags, quantized vector components).
    */
  private val IntCols: Set[String] = Set(
    // base tables
    "doc_id", "n_chars", "vec_id", "label", "event_id", "user_id",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "o_orderkey", "o_custkey", "p_partkey", "p_size",
    "c_custkey", "c_nationkey", "n_nationkey", "n_regionkey",
    "r_regionkey", "s_suppkey", "s_nationkey",
    // derived integer aliases used inside oracle CTEs
    "kept", "toks", "df", "c", "cnt", "n", "s", "ss", "t",
    "is_tp", "is_fn", "is_fp", "tp", "fn", "fp", "new_session", "hit",
    "frame_len", "n_kept", "n_total", "n_docs", "qv", "dim", "sv", "nv",
    "bkt", "half", "chunk_id", "tok_id", "payload_len")

  private val Keywords: Set[String] = Set(
    "case", "when", "then", "else", "end", "and", "or", "not", "in",
    "like", "between", "is", "null", "as", "distinct", "over",
    "partition", "by", "order", "asc", "desc", "rows", "range",
    "preceding", "following", "unbounded", "current", "row",
    "bigint", "int", "integer", "double", "varchar", "filter", "where")

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Violations: (offset, snippet) of integer sums not cast-wrapped. */
  private[graft] def violations(sqlRaw: String): Seq[(Int, String)] = {
    // strip string literals so 'text' content can't look like identifiers
    val sql = sqlRaw.replaceAll("'[^']*'", "''")
    val lower = sql.toLowerCase
    val out = Seq.newBuilder[(Int, String)]
    var i = lower.indexOf("sum")
    while (i >= 0) {
      val isWordStart = i == 0 || !Character.isLetterOrDigit(lower(i - 1)) && lower(i - 1) != '_'
      val j = { var k = i + 3; while (k < sql.length && sql(k).isWhitespace) k += 1; k }
      if (isWordStart && j < sql.length && sql(j) == '(') {
        // balanced-paren argument extraction
        var depth = 1; var k = j + 1
        while (k < sql.length && depth > 0) {
          if (sql(k) == '(') depth += 1 else if (sql(k) == ')') depth -= 1
          k += 1
        }
        val arg = sql.substring(j + 1, k - 1)
        val argL = arg.toLowerCase
        // inner widening exempts: cast(... as decimal/double) inside the arg
        val widened = argL.contains("decimal") || argL.contains("double")
        val idents = Ident.findAllIn(argL).toList
          .filterNot(Keywords)
          .filterNot { id => // function names: identifier followed by '('
            val at = argL.indexOf(id)
            val after = argL.indexWhere(!_.isWhitespace, at + id.length)
            after >= 0 && argL(after) == '('
          }
        val integerValued = !widened && idents.forall(IntCols)
        if (integerValued && !castWrapped(lower, i))
          out += ((i, sql.substring(i, math.min(sql.length, k + 20)).replace('\n', ' ')))
      }
      i = lower.indexOf("sum", i + 3)
    }
    out.result()
  }

  /** True when, scanning backwards over whitespace and any `coalesce(`
    * wrappers, the sum is immediately inside a `cast(`.
    */
  private def castWrapped(lower: String, sumAt: Int): Boolean = {
    var p = sumAt
    var done = false
    var wrapped = false
    while (!done) {
      var e = p - 1
      while (e >= 0 && lower(e).isWhitespace) e -= 1
      if (e >= 0 && lower(e) == '(') {
        var s = e - 1
        while (s >= 0 && (Character.isLetterOrDigit(lower(s)) || lower(s) == '_')) s -= 1
        lower.substring(s + 1, e) match {
          case "cast"     => wrapped = true; done = true
          case "coalesce" => p = s + 1 // keep unwrapping
          case _          => done = true
        }
      } else done = true
    }
    wrapped
  }

  test("checker flags the round-5 failure shape (bare integer sum)") {
    val bad = "SELECT source, count(*) AS n_docs, sum(n_chars) AS n_chars FROM b GROUP BY 1"
    assert(violations(bad).nonEmpty)
  }

  test("checker accepts the bigSum convention and double sums") {
    assert(violations("SELECT cast(sum(n_chars) AS bigint) AS c FROM t").isEmpty)
    assert(violations("SELECT cast(coalesce(sum(kept), 0) AS bigint) AS c FROM t").isEmpty)
    assert(violations("SELECT sum(l_quantity) AS q FROM lineitem").isEmpty)
    assert(violations("SELECT cast(sum(cast(o_totalprice AS decimal(12,2))) AS double) FROM o").isEmpty)
  }

  test("no bare integer sums anywhere in the oracle registry") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      violations(sql).map { case (_, snip) => s"$name: $snip" }
    }
    assert(bad.isEmpty, s"\nbare integer sum(...) in oracle SQL — use OracleSql.bigSum:\n${bad.mkString("\n")}")
  }
}
