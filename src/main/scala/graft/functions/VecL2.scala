package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Sequential-left-fold squared-L2 distance of two numeric arrays in ONE
  * codegen expression pass — the ADC/exact-rescore hot path (q100 PQ
  * recall, q120 IVF-PQ serving).
  *
  * Replaces `aggregate(sequence(0, d-1), 0d, (acc, i) -> acc +
  * (a[i]-b[i])²)`: higher-order functions are CodegenFallback (every
  * element round-trips the interpreted evaluator — the q39 lesson), and
  * the per-(query, candidate) cardinality this runs at is the largest
  * in the ANN pipeline. BIT-EXACT with the HOF form and the DuckDB
  * oracle's `list_reduce`: identical association order (ascending
  * index, `acc + (x−y)²`, both operands cast to double first), all
  * accumulation in double. NULL on NULL input, NULL element, or length
  * mismatch.
  */
case class VecL2(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_l2 requires two array<float|double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecL2.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("l2")
      s"""
         |java.lang.Double $boxed = graft.functions.VecL2.compute(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? 0.0 : $boxed.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2 =
    copy(left = newLeft, right = newRight)
}

object VecL2 {

  /** Static kernel shared by eval and generated code. */
  def compute(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "vec_l2(a, b) takes exactly 2 arguments")
    VecL2(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit =
    Registration.once(spark, "vec_l2", builder)
}
