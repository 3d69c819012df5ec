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
