package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Sequential-left-fold dot product of two numeric arrays in ONE codegen
  * expression pass — the similarity hot path (brute-force cosine q21,
  * LSH/IVF reranks q22/q48/q64, near-dup q25, multimodal cosine).
  *
  * Replaces `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) ->
  * acc+v)`: the higher-order-function form allocates an intermediate
  * products array per row and evaluates both lambdas interpreted
  * (HigherOrderFunction does not participate in whole-stage codegen);
  * this expression is a single allocation-free loop the generated code
  * calls directly. At 100 TB the rerank cost is per-(query, candidate)
  * row — constant-factor savings here multiply by the largest cardinality
  * in the ANN pipeline.
  *
  * BIT-EXACT with the HOF form and the DuckDB oracle's `list_reduce`:
  * identical association order (ascending index, `acc + (double)a_i *
  * (double)b_i`), all accumulation in double. NULL on NULL input, NULL
  * element, or length mismatch — exactly the zip_with(+ null pad) →
  * null-poisoned fold semantics it replaces.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float|double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
         |java.lang.Double $boxed = graft.functions.VecDot.compute(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? 0.0 : $boxed.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {

  /** Static kernel shared by eval and generated code. Boxed null on
    * length mismatch or a null element (the zip_with form's semantics).
    */
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
      acc += x * y
      i += 1
    }
    acc
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "vec_dot(a, b) takes exactly 2 arguments")
    VecDot(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit =
    Registration.once(spark, "vec_dot", builder)
}
