package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.tables.Tables

/** Judged queries whose results are PRODUCED BY the streaming path —
  * the events table is replayed as micro-batches through a Structured
  * Streaming job inside the query, and the returned DataFrame reads the
  * job's sink. The DuckDB oracle is the plain batch SQL: the gate
  * therefore proves streamed ≡ batch on real data, not just in specs.
  */
object StreamingQueries {

  private val TopN = 5
  private val ReplayFiles = 8

  /** Per-event-type top-5 events by value, computed by replaying events
    * as [[ReplayFiles]] micro-batches through [[StreamingTopK]]
    * (`mapGroupsWithState`, k-bounded state per key).
    *
    * Replay order independence: bounded top-k is a semilattice merge —
    * max-k(union) is the same whatever the batch boundaries or their
    * order — so the replay needs NO cross-batch ordering guarantee and
    * the result is deterministic however the file source schedules the
    * 8 files. (Order-SENSITIVE state machines like the funnel get
    * batch-parity specs instead; a judged query must never depend on
    * file listing order.)
    */
  val q66StreamingTopK: QuerySpec = QuerySpec(
    (s, dir) => {
      import s.implicits._
      val batch = Tables.events(s, dir)
        .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      // stage the stream input as multiple files => multiple micro-batches
      val replayDir = Files.createTempDirectory("graft-q66-replay")
      // unique sink name: the query may run more than once per session
      val sink = "q66_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      try {
        batch.repartition(ReplayFiles).write.mode("overwrite")
          .parquet(replayDir.toString)
        val stream = s.readStream.schema(batch.schema)
          .option("maxFilesPerTrigger", "1") // one file per micro-batch: a real replay
          .parquet(replayDir.toString)
          .as[StreamingTopK.Ev]
        val job = StreamingTopK.topK(stream, k = TopN).toDF()
          .writeStream.format("memory").queryName(sink)
          .outputMode("update")
          .start()
        job.processAllAvailable()
        job.stop()
        // update mode re-emits a key's top list every batch that touches
        // it — keep each key's LAST emission (the converged state),
        // identified by the per-key batch counter the state function
        // emits (`seq`): no reliance on sink scan order or id
        // monotonicity. The view name is dropped in the finally block —
        // safe, because s.table() resolves the plan eagerly and the
        // returned Dataset keeps the bound memory relation.
        s.table(sink).groupBy(col("event_type"))
          .agg(max_by(col("top"), col("seq")).as("top"))
          .select(col("event_type"), posexplode(col("top")))
          .select(col("event_type"), col("col.event_id").as("event_id"),
            col("col.value").as("value"), (col("pos") + 1).cast("integer").as("rank"))
          .orderBy(col("event_type"), col("rank"))
      } finally {
        s.catalog.dropTempView(sink)
        // the replay staging dir is consumed once the job has stopped
        import scala.jdk.CollectionConverters._
        Files.walk(replayDir).iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
      }
    },
    s"""SELECT event_type, event_id, value, rank
       |FROM (SELECT event_type, event_id, value,
       |        cast(row_number() OVER (PARTITION BY event_type
       |               ORDER BY value DESC, event_id) AS integer) AS rank
       |      FROM events)
       |WHERE rank <= $TopN ORDER BY event_type, rank""".stripMargin)

  val all: Map[String, QuerySpec] = Map(
    "q66_streaming_topk" -> q66StreamingTopK)
}
