package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle array in ONE expression pass — a
  * native codegen `Expression` replacing the explode → 8×md5 →
  * groupBy(min…) pipeline: the k per-seed minima of md5("seed|shingle")
  * are folded per ROW, so the signature costs zero shuffles and never
  * materializes the (docs × shingles) relation.
  *
  * Bit-identical to the aggregation form (and therefore to the DuckDB
  * oracle): same "i|shingle" seeding, same lowercase-hex md5, same
  * lexicographic minima — verified by `MinHashSigsSpec` against the
  * agg path and by the q17/q18 oracle gate.
  *
  * Returns NULL for empty/all-null arrays (mirrors the groupBy form,
  * where a doc with no shingles has no row).
  */
case class MinHashSigs(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashSigs.compute($c, $numHashes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Static kernel shared by eval and generated code. Null on empty
    * input (no shingles ⇒ no signature).
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(k)(j => s"$j|".getBytes("UTF-8"))
    val mins = new Array[UTF8String](k)
    var i = 0
    while (i < n) {
      val sh = arr.getUTF8String(i)
      if (sh != null) {
        val shBytes = sh.getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(prefixes(j))
          md.update(shBytes)
          val hex = toHex(md.digest())
          if (mins(j) == null || hex.compareTo(mins(j)) < 0) mins(j) = hex
          j += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) null
    else new GenericArrayData(mins.asInstanceOf[Array[Any]])
  }

  private def toHex(digest: Array[Byte]): UTF8String = {
    val out = new Array[Byte](digest.length * 2)
    var i = 0
    while (i < digest.length) {
      out(2 * i) = HexDigits((digest(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(digest(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Register `minhash_sigs(arr, k)` (k must be a literal). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs",
      exprs => MinHashSigs(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "scala_udf")
}
