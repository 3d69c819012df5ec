package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.state.StateTable

/** Streaming sketch maintenance: fold each micro-batch of documents into
  * a persistent Count-Min sketch. Count-Min is LINEAR — cells from
  * disjoint slices add — so the streamed sketch is *exactly* the batch
  * sketch over everything ingested, not an approximation of it; that
  * mergeability is why a d×w sketch can summarize a 100 TB stream in a
  * few KB of state per table.
  *
  * State lives in a [[StateTable]] (atomic version swap per batch, time
  * travel across batches for free); the merge is cell-wise sum —
  * shuffle bounded by d×w cells regardless of batch size.
  */
object StreamingSketch {

  /** Merge one micro-batch of documents (needs a `text` column) into the
    * sketch table. Usable directly as a `foreachBatch` body.
    */
  def mergeBatch(sketch: StateTable, docs: DataFrame): Unit = {
    val cells = graft.ext.TextOps.cmsCells(docs)
    val merged = sketch.read() match {
      case None => cells
      case Some(prev) =>
        prev.select(col("j"), col("bucket"), col("cnt"))
          .unionByName(cells)
          .groupBy(col("j"), col("bucket"))
          .agg(sum(col("cnt")).as("cnt"))
    }
    sketch.overwrite(merged)
  }

  /** Attach to a streaming Dataset of documents: one sketch merge per
    * micro-batch (exactly-once per epoch via the checkpointed batch id —
    * StateTable versions make replayed batches idempotent to re-merge
    * only if the caller dedups on batchId; keep the checkpoint dir).
    */
  def attach(
      stream: DataFrame,
      sketch: StateTable,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, _: Long) => mergeBatch(sketch, batch))
      .start()
}
