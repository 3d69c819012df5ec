package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Product-quantization encode + reconstruct in ONE codegen expression:
  * for each of `m` subspaces of `dsub` dims, pick the codebook entry
  * (of `cents`, an array of full-width centroid vectors) minimizing the
  * sub-slice squared-L2 to the input, and emit the concatenation of the
  * chosen entries' sub-slices — the decoded reconstruction ADC scoring
  * runs against.
  *
  * Replaces the nested `transform(sequence(...), m -> array_min(
  * transform(sequence(...), c -> named_struct(d: aggregate(...), c))))`
  * + `flatten(transform(... slice ...))` chain — ~m·k·dsub interpreted
  * lambda invocations PER ROW (higher-order functions are
  * CodegenFallback, the q39 lesson), the single most expensive per-row
  * cost in the bench (q100/q120). This kernel is one allocation-light
  * loop the generated code calls directly.
  *
  * BIT-EXACT with the lambda chain and the DuckDB oracle: sub-distances
  * fold ascending-dimension in double (`acc + (x−y)²` with both
  * operands cast double first — the same association order), and the
  * argmin keeps the FIRST minimum scanning codes ascending, which is
  * exactly the lexicographic `array_min` over (dist, code) structs.
  * Codes are integers, so equal reconstructions follow from equal
  * argmins. NULL on NULL input, NULL/short element, or a sub-slice out
  * of range.
  */
case class PqRecon(left: Expression, right: Expression, m: Int, dsub: Int)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (e, ArrayType(inner, _)) if elemOk(e) && elemOk(inner) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_recon requires (array<float|double>, array<array<float|double>>), got " +
        s"${l.catalogString}, ${r.catalogString}")
  }

  private def centElem: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(centElem, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_recon"

  private def embFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def centFloat: Boolean = centElem == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqRecon.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m, dsub, embFloat, centFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = graft.functions.PqRecon.compute(
         |  $a, $b, $m, $dsub, $embFloat, $centFloat);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqRecon =
    copy(left = newLeft, right = newRight)
}

object PqRecon {

  /** Static kernel shared by eval and generated code. Null (boxed) on
    * any null/short element — the lambda chain's null-poisoning shape.
    */
  def compute(emb: ArrayData, cents: ArrayData, m: Int, dsub: Int,
      embFloat: Boolean, centFloat: Boolean): ArrayData = {
    val dim = m * dsub
    if (emb.numElements() < dim) return null
    val k = cents.numElements()
    if (k == 0) return null
    val centRows = new Array[ArrayData](k)
    var c = 0
    while (c < k) {
      if (cents.isNullAt(c)) return null
      val row = cents.getArray(c)
      if (row.numElements() < dim) return null
      centRows(c) = row
      c += 1
    }
    def at(a: ArrayData, isFloat: Boolean, i: Int): Double =
      if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val off = sub * dsub
      var best = Double.PositiveInfinity
      var bestC = 0
      c = 0
      while (c < k) {
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val x = at(emb, embFloat, off + d)
          val y = at(centRows(c), centFloat, off + d)
          val diff = x - y
          acc += diff * diff
          d += 1
        }
        // strict < keeps the FIRST (lowest-code) minimum — the
        // lexicographic (dist, code) struct-min tie-break
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      codes(sub) = bestC
      sub += 1
    }
    if (centFloat) {
      val out = new Array[Float](dim)
      sub = 0
      while (sub < m) {
        val row = centRows(codes(sub))
        var d = 0
        while (d < dsub) { out(sub * dsub + d) = row.getFloat(sub * dsub + d); d += 1 }
        sub += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Double](dim)
      sub = 0
      while (sub < m) {
        val row = centRows(codes(sub))
        var d = 0
        while (d < dsub) { out(sub * dsub + d) = row.getDouble(sub * dsub + d); d += 1 }
        sub += 1
      }
      new GenericArrayData(out)
    }
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4,
      "pq_recon(embedding, cents, m, dsub) takes exactly 4 arguments")
    def intLit(e: Expression, what: String): Int = {
      require(e.foldable, s"pq_recon: $what must be a literal integer")
      e.eval().asInstanceOf[Number].intValue()
    }
    PqRecon(exprs.head, exprs(1), intLit(exprs(2), "m"), intLit(exprs(3), "dsub"))
  }

  def register(spark: SparkSession): Unit =
    Registration.once(spark, "pq_recon", builder)
}
