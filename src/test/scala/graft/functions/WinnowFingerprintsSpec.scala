package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Parity of the one-pass [[WinnowFingerprints]] expression with (a) a
  * brute-force Scala reimplementation (re-fold every gram, explicit
  * window minima) and (b) the original transform/slice lambda chain it
  * replaced — on real corpus text and on the edge shapes (too-short
  * strings, all-identical chars, exact window-boundary lengths).
  */
class WinnowFingerprintsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def brute(s: String): Set[Long] = {
    import RollingHash.{Mod, Mult}
    val K = WinnowFingerprints.K
    val W = WinnowFingerprints.W
    if (s.length < K + W - 1) return Set.empty
    val hashes = s.sliding(K).map(_.foldLeft(0L)((h, c) => (h * Mult + c) % Mod)).toVector
    hashes.sliding(W).map(_.min).toSet
  }

  test("matches brute force on edge shapes") {
    for (s <- Seq("", "short", "0123456789", "01234567891", "aaaaaaaaaaaaaaaa",
        "the quick brown fox jumps over the lazy dog", "abcdefghijk")) {
      val got = WinnowFingerprints.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(got.toLongArray().toSet == brute(s), s"winnow mismatch on '$s'")
      assert(got.toLongArray().distinct.length == got.numElements(), s"dupes for '$s'")
    }
  }

  test("non-BMP text: UTF-16 code-unit semantics (RollingHash contract)") {
    // A surrogate pair (U+1D11E MUSICAL SYMBOL G CLEF) is TWO UTF-16
    // code units: the expression grams by charAt, so it must match the
    // char-based brute force — and must DIVERGE from a codepoint-based
    // gramming (the replaced `substring` lambda chain), because both
    // the gram count (n is the UTF-16 length) and the per-gram folds
    // (surrogate halves hash separately) differ. This pins the class
    // doc's declared semantics rather than leaving them ASCII-only.
    val s = "ab𝄞cdef𝄞ghij" // 14 code units, 12 codepoints
    val got = WinnowFingerprints.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toLongArray().toSet
    assert(got == brute(s), "non-BMP winnow must follow UTF-16 code units")
    RollingHash.register(spark)
    val one = spark.range(1).selectExpr(s"'${s}' AS norm")
      .withColumn("hashes", expr(
        "transform(sequence(1, length(norm) - 7), i -> rolling_hash(substring(norm, i, 8)))"))
      .selectExpr("array_distinct(transform(sequence(1, size(hashes) - 3), i -> array_min(slice(hashes, i, 4)))) AS fps")
    val codepointChain = one.head().getSeq[Long](0).toSet
    assert(codepointChain != got,
      "expected divergence on non-BMP text: substring grams by codepoint, winnow_fps by UTF-16 unit")
  }

  test("matches the lambda chain it replaced, on real corpus text") {
    RollingHash.register(spark)
    WinnowFingerprints.register(spark)
    val docs = graft.tables.Tables.documents(spark, TestSpark.testdata("0.001"))
      .withColumn("norm", graft.ext.TextOps.normCol)
      .filter(length(col("norm")) >= 11)
    val old = docs
      .withColumn("hashes",
        expr("transform(sequence(1, length(norm) - 7), i -> rolling_hash(substring(norm, i, 8)))"))
      .select(col("doc_id"), explode(array_distinct(
        expr("transform(sequence(1, size(hashes) - 3), i -> array_min(slice(hashes, i, 4)))"))).as("fp"))
    val neu = docs.select(col("doc_id"), explode(expr("winnow_fps(norm)")).as("fp"))
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty,
      "winnow_fps disagrees with the transform/slice chain")
    assert(neu.count() > 0)
  }
}
