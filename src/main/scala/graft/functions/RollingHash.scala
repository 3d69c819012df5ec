package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string — a native Catalyst `Expression`
  * with whole-stage codegen (no UDF boxing; stays inside the generated
  * loop).
  *
  * h = fold over chars: h ← (h · MULT + char) mod MOD, h₀ = 0.
  *
  * Engine-portable: the same fold is expressible in ANSI SQL as a
  * char-list reduce (see [[graft.ext.TextOps.q31RollingFingerprint]]'s
  * oracle), so results are oracle-checkable. Defined on UTF-16 code
  * units; identical to codepoint folds for ASCII corpora.
  *
  * MOD < 2³¹ keeps every intermediate < 2⁶² (no overflow in either
  * engine — DuckDB bigint arithmetic *errors* on overflow rather than
  * wrapping, so the modulus is load-bearing for parity, not just range).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  import RollingHash.{Mod, Mult}

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * Mult + s.charAt(i)) % Mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * ${Mult}L + $s.charAt($i)) % ${Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Mult = 31L
  val Mod = 1000000007L

  /** Register `rolling_hash` in the session's function registry, making
    * it usable from SQL text, `expr(...)`, and SQL lambda bodies.
    * (Sessions built with [[graft.GraftExtensions]] get it injected at
    * build time instead.)
    */
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "rolling_hash", exprs => RollingHash(exprs.head))
}
