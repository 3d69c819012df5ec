package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide lint over `SparkEntry.oracleSql`, enforcing the SQL
  * conventions that keep DuckDB's answer bit-comparable to Spark's.
  * Three rules, each born from a real (or near-miss) hash mismatch:
  *
  *  1. BARE INTEGER SUM — DuckDB widens `sum(INTEGER/BIGINT)` to
  *     HUGEINT, which surfaces as float64 in the driver's comparison
  *     frame against Spark's int64 — `hash_match=false` with
  *     rows/schema green (the round-5 q79/q80/q85 failure mode).
  *     Every `sum(...)` whose argument is integer-valued must be
  *     wrapped as `cast(sum(...) AS bigint)` (optionally through a
  *     `coalesce`), i.e. built with `OracleSql.bigSum`. Sums over
  *     double columns (l_quantity, o_totalprice, value, ...) or over
  *     expressions already widened via an inner `cast(... AS
  *     decimal/double)` are exempt — DuckDB and Spark agree there.
  *  2. BARE INTEGER AVG — `avg(INTEGER)` returns DOUBLE in both
  *     engines TODAY (both exact-sum-then-divide), but the result
  *     type is an implementation choice either engine may revisit
  *     (DuckDB has changed agg result types across releases), and the
  *     near-miss history in q97's percentile work showed how silently
  *     an implicit widening diverges. Convention: spell the widening —
  *     `cast(avg(...) AS double)` — so the comparison type is pinned
  *     in the oracle text, not inherited. Same exemptions as sum,
  *     EXCEPT decimal: `avg(DECIMAL)` is the one adjacent divergence
  *     class where the engines disagree TODAY — Spark returns
  *     DECIMAL(p+4, s+4), DuckDB DOUBLE — so an inner `cast(... AS
  *     decimal)` does NOT exempt an avg; the call must still be pinned
  *     with an outer `cast(avg(...) AS double)`.
  *  3. NEGATIVE-OPERAND `//` — DuckDB's `//` FLOORS while Spark's
  *     `div` TRUNCATES toward zero; they agree only when the quotient
  *     is non-negative. Any `//` whose operand text shows a way to go
  *     negative (a subtraction or unary minus in the operand) is
  *     flagged; positive-only arithmetic (counts, epochs, quantized
  *     ranks — every current use) passes. A flagged site must be
  *     rewritten to the shared floor()/greatest() form (see
  *     `VectorOps` q64 for the worked bigint-floor pattern).
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

  /** Rule 1+2 violations: (offset, snippet) of integer `fn(...)` calls
    * (fn = sum | avg) not cast-wrapped.
    */
  private[graft] def violations(sqlRaw: String, fn: String = "sum"): Seq[(Int, String)] = {
    // strip string literals so 'text' content can't look like identifiers
    val sql = sqlRaw.replaceAll("'[^']*'", "''")
    val lower = sql.toLowerCase
    val out = Seq.newBuilder[(Int, String)]
    var i = lower.indexOf(fn)
    while (i >= 0) {
      val isWordStart = i == 0 || !Character.isLetterOrDigit(lower(i - 1)) && lower(i - 1) != '_'
      val j = { var k = i + fn.length; while (k < sql.length && sql(k).isWhitespace) k += 1; k }
      if (isWordStart && j < sql.length && sql(j) == '(') {
        // balanced-paren argument extraction
        var depth = 1; var k = j + 1
        while (k < sql.length && depth > 0) {
          if (sql(k) == '(') depth += 1 else if (sql(k) == ')') depth -= 1
          k += 1
        }
        val arg = sql.substring(j + 1, k - 1)
        val argL = arg.toLowerCase
        // inner widening exempts: cast(... as double) always; cast(...
        // as decimal) only for sum — avg(DECIMAL) diverges TODAY
        // (Spark DECIMAL(p+4,s+4) vs DuckDB DOUBLE), so a decimal arg
        // must still be pinned with an outer cast
        val widened = argL.contains("double") ||
          (fn != "avg" && argL.contains("decimal"))
        val avgOverDecimal = fn == "avg" && argL.contains("decimal") &&
          !argL.contains("double")
        // classify each identifier OCCURRENCE at its own match position
        // (an id can be a function in one spot and a column in another;
        // indexOf-based classification tagged every occurrence by the
        // first, and matched substrings inside longer identifiers)
        val idents = Ident.findAllMatchIn(argL)
          .filterNot(m => Keywords(m.matched))
          .filterNot { m => // function names: identifier followed by '('
            val after = argL.indexWhere(!_.isWhitespace, m.end)
            after >= 0 && argL(after) == '('
          }
          .map(_.matched).toList
        val integerValued = !widened && idents.forall(IntCols)
        if ((integerValued || avgOverDecimal) && !castWrapped(lower, i))
          out += ((i, sql.substring(i, math.min(sql.length, k + 20)).replace('\n', ' ')))
      }
      i = lower.indexOf(fn, i + fn.length)
    }
    out.result()
  }

  /** True when, scanning backwards over whitespace and any `coalesce(`
    * wrappers, the agg call is immediately inside a `cast(`.
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

  /** Rule 3 violations: (offset, snippet) of `//` sites whose operand
    * text admits a negative value (a `-` inside either operand). The
    * operand is read structurally: a balanced paren group plus any
    * attached function/identifier head on the left; an optional unary
    * minus, then an identifier/literal or paren group (with attached
    * call head) on the right.
    */
  private[graft] def divViolations(sqlRaw: String): Seq[(Int, String)] = {
    val sql = sqlRaw.replaceAll("'[^']*'", "''")
    def identChar(c: Char) = Character.isLetterOrDigit(c) || c == '_' || c == '.'
    def leftOperand(from: Int): String = {
      var e = from
      while (e >= 0 && sql(e).isWhitespace) e -= 1
      if (e < 0) return ""
      var s = e
      if (sql(s) == ')') { // balanced group backwards
        var depth = 1; s -= 1
        while (s >= 0 && depth > 0) {
          if (sql(s) == ')') depth += 1 else if (sql(s) == '(') depth -= 1
          s -= 1
        }
        while (s >= 0 && identChar(sql(s))) s -= 1 // call head (cast/floor/...)
      } else {
        while (s >= 0 && identChar(sql(s))) s -= 1
      }
      val text = sql.substring(s + 1, e + 1)
      // unary minus in front of the operand (binary '-' also flags:
      // precedence means `a - b // c` divides only b, but an oracle
      // relying on that is exactly the subtle site the rule exists for)
      var u = s
      while (u >= 0 && sql(u).isWhitespace) u -= 1
      if (u >= 0 && sql(u) == '-') "-" + text else text
    }
    def rightOperand(from: Int): String = {
      var s = from
      while (s < sql.length && sql(s).isWhitespace) s += 1
      if (s >= sql.length) return ""
      val neg = sql(s) == '-'
      if (neg) { s += 1; while (s < sql.length && sql(s).isWhitespace) s += 1 }
      var e = s
      while (e < sql.length && identChar(sql(e))) e += 1
      if (e < sql.length && sql(e) == '(') { // call / subquery group
        var depth = 1; e += 1
        while (e < sql.length && depth > 0) {
          if (sql(e) == '(') depth += 1 else if (sql(e) == ')') depth -= 1
          e += 1
        }
      }
      (if (neg) "-" else "") + sql.substring(s, e)
    }
    val out = Seq.newBuilder[(Int, String)]
    var i = sql.indexOf("//")
    while (i >= 0) {
      if (leftOperand(i - 1).contains("-") || rightOperand(i + 2).contains("-"))
        out += ((i, sql.substring(math.max(0, i - 30), math.min(sql.length, i + 30)).replace('\n', ' ')))
      i = sql.indexOf("//", i + 2)
    }
    out.result()
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

  test("identifier occurrences classify at their own position, not the first") {
    // `foo` is a call in one spot and a column in another; indexOf-based
    // classification tagged the column occurrence as a function too,
    // leaving only IntCols idents → a false positive
    assert(violations("SELECT sum(foo(n_chars) + foo) AS x FROM t").isEmpty)
    // substring trap: `n` must not match inside `n_chars`
    assert(violations("SELECT sum(n + n_chars) AS x FROM t").nonEmpty)
  }

  test("checker flags bare integer avg and accepts the pinned form") {
    val bad = "SELECT source, avg(n_chars) AS mean_chars FROM documents GROUP BY 1"
    assert(violations(bad, "avg").nonEmpty)
    assert(violations("SELECT cast(avg(n_chars) AS double) AS m FROM t", "avg").isEmpty)
    assert(violations("SELECT avg(l_quantity) AS m FROM lineitem", "avg").isEmpty)
    assert(violations("SELECT avg(cast(n_chars AS double)) AS m FROM t", "avg").isEmpty)
  }

  test("checker flags avg over DECIMAL unless pinned (Spark DECIMAL vs DuckDB DOUBLE)") {
    // the one divergence that exists TODAY: Spark's avg(DECIMAL(p,s))
    // returns DECIMAL(p+4, s+4), DuckDB's returns DOUBLE — an inner
    // decimal cast must NOT exempt the call the way it does for sum
    assert(violations("SELECT avg(cast(o_totalprice AS decimal(12,2))) AS m FROM o", "avg").nonEmpty)
    assert(violations("SELECT cast(avg(cast(o_totalprice AS decimal(12,2))) AS double) AS m FROM o", "avg").isEmpty)
    // sum keeps the decimal exemption (both engines widen exactly)
    assert(violations("SELECT sum(cast(o_totalprice AS decimal(12,2))) AS m FROM o").isEmpty)
  }

  test("checker flags negative-operand floor division") {
    assert(divViolations("SELECT (a - b) // c AS q FROM t").nonEmpty)
    assert(divViolations("SELECT a // -4 AS q FROM t").nonEmpty)
    assert(divViolations("SELECT -a // 4 AS q FROM t").nonEmpty)
    // negative DIVISOR via binary subtraction (not just unary minus):
    // floor-vs-trunc flips exactly when the quotient goes negative, and
    // a subtraction inside the right operand is how that hides
    assert(divViolations("SELECT a // (b - c) AS q FROM t").nonEmpty)
    // subtraction buried in a call on the dividend side
    assert(divViolations("SELECT floor(a - b) // c AS q FROM t").nonEmpty)
    // every current registry shape: positive-only operands
    assert(divViolations("SELECT cast(floor(epoch(ts)) AS bigint) // 900 AS w FROM t").isEmpty)
    assert(divViolations("SELECT 1000000000000 // (SELECT n_docs FROM nn) AS q FROM t").isEmpty)
    assert(divViolations("SELECT r.q // g.d AS contrib FROM r JOIN g USING (dst)").isEmpty)
  }

  test("no bare integer sums anywhere in the oracle registry") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      violations(sql).map { case (_, snip) => s"$name: $snip" }
    }
    assert(bad.isEmpty, s"\nbare integer sum(...) in oracle SQL — use OracleSql.bigSum:\n${bad.mkString("\n")}")
  }

  test("no bare integer avgs anywhere in the oracle registry") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      violations(sql, "avg").map { case (_, snip) => s"$name: $snip" }
    }
    assert(bad.isEmpty, s"\nbare integer avg(...) in oracle SQL — pin with cast(avg(...) AS double):\n${bad.mkString("\n")}")
  }

  /** `//` sites with a `-` in an operand that a human audit proved
    * sign-safe — each entry is (query name, snippet marker, and the
    * reason in the comment). A NEW subtraction-bearing `//` fails the
    * registry test until it is audited and listed here.
    */
  private val DivAuditedSafe: Seq[(String, String)] = Seq(
    // min-anchored grid normalization: x >= mnx and y >= mny (the mn*
    // are min() over the same frame) so the numerator is >= 0, and
    // mx* >= mn* so the divisor is >= 1 — quotient never negative
    ("q104_zorder_layout", "- mnx) * 256) // (mxx - mnx + 1)"),
    ("q104_zorder_layout", "- mny) * 256) // (mxy - mny + 1)"),
    ("q109_zorder_prune", "- mnx) * 256) // (mxx - mnx + 1)"),
    ("q109_zorder_prune", "- mny) * 256) // (mxy - mny + 1)"),
    // mathematical-mod floor pattern (VectorOps q64): subtracting
    // ((sv % nv) + nv) % nv makes the numerator exactly divisible by
    // nv, and floor == trunc on exact quotients at any sign
    ("q64_ann_ivf_kmeans", "% nv) + nv) % nv)) // nv"),
    ("q107_embedding_outliers", "% nv) + nv) % nv)) // nv"),
    ("q128_cluster_reps", "% nv) + nv) % nv)) // nv"),
    // the same floored-mean identity, inherited by the whole IVF family
    // through the shared trained-codebook chain (trainedChainSql)
    ("q48_ann_ivf", "% nv) + nv) % nv)) // nv"),
    ("q116_shard_admission", "% nv) + nv) % nv)) // nv"),
    ("q120_ivfpq_ann", "% nv) + nv) % nv)) // nv"),
    ("q125_knn_classify", "% nv) + nv) % nv)) // nv"),
    // wedge count C(degree, 2): the frame filters degree >= 2, so
    // degree - 1 >= 1 and the product is positive — quotient never
    // negative (and even, so floor == trunc exactly anyway)
    ("q123_triangle_clustering", "(d.degree - 1) // 2 AS bigint"),
    ("q123_triangle_clustering", "(d.degree - 1) // 2 AS double"),
    // audio diff-window index: the frame filters i >= 1 so i - 1 >= 0,
    // and n >= 256 (motif-keyed clip length) so n - 1 >= 1 — quotient
    // never negative
    ("q135_multimodal_neardup", "((i - 1) * 57) // (n - 1)"),
    // fixed-chunk index: i ranges over 1..len(w) (DuckDB range is
    // 1-based here) so i - 1 >= 0 — quotient never negative
    ("q145_cdc_chunking", "(i - 1) // 16"))

  test("no unaudited negative-operand floor division in the oracle registry") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      divViolations(sql)
        .filterNot { case (_, snip) =>
          DivAuditedSafe.exists { case (q, m) => q == name && snip.contains(m) }
        }
        .map { case (_, snip) => s"$name: $snip" }
    }
    assert(bad.isEmpty,
      s"\n`//` with possibly-negative operands (DuckDB floors, Spark div truncates) — " +
        s"audit the site and extend DivAuditedSafe, or rewrite sign-safe:\n${bad.mkString("\n")}")
  }
}
