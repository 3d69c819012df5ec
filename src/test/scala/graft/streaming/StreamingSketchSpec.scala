package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.state.StateTable

class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("incrementally merged sketch equals the batch sketch (CMS linearity)") {
    val docs = graft.tables.Tables.documents(spark, TestSpark.testdata("0.001"))
    val sketch = new StateTable(spark, Files.createTempDirectory("graft-cms").toString,
      keyCols = Seq("j", "bucket"))

    // two disjoint micro-batches
    StreamingSketch.mergeBatch(sketch, docs.filter(col("doc_id") % 2 === 0), batchId = 0L)
    StreamingSketch.mergeBatch(sketch, docs.filter(col("doc_id") % 2 =!= 0), batchId = 1L)
    // replayed epoch (failure before checkpoint commit): must be a no-op
    StreamingSketch.mergeBatch(sketch, docs.filter(col("doc_id") % 2 =!= 0), batchId = 1L)

    val streamed = sketch.current().get
      .select(col("j"), col("bucket"), col("cnt"))
      .orderBy(col("j"), col("bucket")).collect().toSeq
    val batch = graft.ext.TextOps.cmsCells(docs)
      .orderBy(col("j"), col("bucket")).collect().toSeq

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
