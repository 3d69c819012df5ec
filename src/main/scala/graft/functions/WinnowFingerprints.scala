package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The full winnowing fingerprint set (MOSS scheme, k=8, w=4) of a
  * string as ONE native expression: distinct minima of every 4-hash
  * window over the rolling hashes of all 8-char grams.
  *
  * Replaces the lambda chain
  * `array_distinct(transform(seq, i -> array_min(slice(transform(seq,
  * i -> rolling_hash(substring(...))), i, 4))))`, which was the most
  * expensive headline entry: higher-order functions are CodegenFallback
  * (every element round-trips the interpreted evaluator) and the chain
  * allocates a substring per gram plus an array per window. This
  * expression stays inside whole-stage codegen (the generated code
  * calls one static method), hashes each gram in O(1) via the actual
  * ROLLING update `h' = ((h − c·31⁷) · 31 + c') mod p` instead of
  * re-folding 8 chars per position, and allocates only the result.
  *
  * Parity: gram hashes equal [[RollingHash]]'s fold exactly (same
  * MULT/MOD, mod applied per step ≡ polynomial mod), so the DuckDB
  * oracle's char-list reduce keeps matching; the produced SET is
  * identical to the lambda chain's (element order may differ — every
  * consumer sorts after explode).
  *
  * Character unit: grams are UTF-16 CODE UNITS (`String.charAt`) — the
  * same contract as [[RollingHash]] ("defined on UTF-16 code units") —
  * so on non-BMP text (surrogate pairs) both gram boundaries and hash
  * values differ from a codepoint-based gramming such as the replaced
  * `substring` lambda chain. Identical for ASCII/BMP input, which is
  * all the normalized corpus produces; `WinnowFingerprintsSpec` pins
  * both the UTF-16 semantics and the non-BMP divergence explicitly.
  */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  val K = 8 // gram length (chars)
  val W = 4 // winnowing window (grams)
  import RollingHash.{Mod, Mult}
  private val Empty = new GenericArrayData(Array.empty[Long])
  // 31^(K-1) mod p — the outgoing char's positional weight
  private val PowK1: Long = {
    var p = 1L; var i = 0
    while (i < K - 1) { p = (p * Mult) % Mod; i += 1 }
    p
  }

  /** Distinct window minima for `u`; empty when the string is shorter
    * than one full window (K + W − 1 chars). Called from generated code.
    */
  def compute(u: UTF8String): ArrayData = {
    val s = u.toString
    val n = s.length
    if (n < K + W - 1) return Empty
    val m = n - K + 1 // gram count
    val hashes = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < K) { h = (h * Mult + s.charAt(i)) % Mod; i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      // drop char i-1, add char i+K-1; keep the residue non-negative
      h = ((h - (s.charAt(i - 1) * PowK1) % Mod + Mod) % Mod * Mult +
        s.charAt(i + K - 1)) % Mod
      hashes(i) = h
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val buf = new scala.collection.mutable.ArrayBuffer[Long](m - W + 1)
    i = 0
    while (i <= m - W) {
      var mn = hashes(i)
      var j = 1
      while (j < W) { if (hashes(i + j) < mn) mn = hashes(i + j); j += 1 }
      if (seen.add(mn)) buf += mn
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** Register `winnow_fps` in the session's function registry (sessions
    * built with [[graft.GraftExtensions]] get it injected at build time).
    */
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "winnow_fps", exprs => WinnowFingerprints(exprs.head))
}
