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

  override def checkInputDataTypes(): TypeCheckResult =
    if (numHashes <= 0)
      TypeCheckResult.TypeCheckFailure(s"minhash_sigs requires k > 0, got $numHashes")
    else child.dataType match {
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

  // per-k seed byte-arrays, cached: "j|" (normal) and "j" (what the agg
  // form's concat_ws degrades to when the element is NULL)
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Array[Byte]], Array[Array[Byte]])]()

  private def prefixes(k: Int): (Array[Array[Byte]], Array[Array[Byte]]) =
    prefixCache.computeIfAbsent(k, kk =>
      (Array.tabulate(kk)(j => s"$j|".getBytes("UTF-8")),
        Array.tabulate(kk)(j => s"$j".getBytes("UTF-8"))))

  /** Static kernel shared by eval and generated code. Null on empty
    * input (no shingles ⇒ no signature). A NULL element hashes as the
    * bare seed — exactly what the aggregation form's
    * `concat_ws("|", seed, NULL)` collapses to — so the two forms stay
    * bit-identical even on inputs TextOps never produces.
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = Md5Local.get()
    val (withSep, bare) = prefixes(k)
    val mins = new Array[UTF8String](k)
    var i = 0
    while (i < n) {
      val sh = arr.getUTF8String(i)
      val shBytes = if (sh == null) null else sh.getBytes
      var j = 0
      while (j < k) {
        if (shBytes == null) md.update(bare(j))
        else { md.update(withSep(j)); md.update(shBytes) }
        val hex = toHex(md.digest()) // digest() resets the instance
        if (mins(j) == null || hex.compareTo(mins(j)) < 0) mins(j) = hex
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.asInstanceOf[Array[Any]])
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

  /** Shared builder for both registration paths (temp function and
    * [[graft.GraftExtensions]]): validates arity and that k is a
    * foldable integer literal, with a clear error instead of an
    * executor-side crash.
    */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "minhash_sigs(arr, k) takes exactly 2 arguments")
    require(exprs(1).foldable, "minhash_sigs: k must be a literal")
    MinHashSigs(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
  }

  /** Register `minhash_sigs(arr, k)` (k must be a literal). */
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "minhash_sigs", builder)
}

/** One MessageDigest per thread for the hash kernels — getInstance per
  * row would do a JCA provider lookup per document.
  */
private[functions] object Md5Local {
  private val tl = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  def get(): MessageDigest = { val md = tl.get(); md.reset(); md }
}
