package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (connected components,
  * PageRank): each round's state must be pinned, or the logical plan
  * doubles per iteration and the DAG explodes.
  *
  * Two modes, selected by the session conf `spark.graft.checkpointDir`:
  *
  *  - unset (default, and the right call in local mode / short jobs):
  *    `localCheckpoint()` — blocks pinned in executor storage memory,
  *    zero I/O, but NOT fault-tolerant: lose an executor and the
  *    truncated lineage cannot recompute the lost partitions, so the
  *    job dies.
  *  - set to a reliable directory (HDFS/object store): `checkpoint()` —
  *    each round's state is written to stable storage, so a multi-hour
  *    100 TB run survives executor loss at the cost of one write+read
  *    of the (small, already-aggregated) loop state per round. The
  *    data pinned here is loop STATE (labels, ranks, contracted edge
  *    lists), not the corpus, so the I/O is proportional to the vertex
  *    set.
  *
  * Both modes are eager (the plan is executed at the pin point), so the
  * convergence probes that follow read materialized state either way —
  * results are bit-identical across modes, which `CheckpointModeSpec`
  * asserts.
  */
object Checkpoints {

  val DirConf = "spark.graft.checkpointDir"

  /** Pin `df` per the session's configured mode (see object doc). */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        // setCheckpointDir stores a fully-qualified URI with a
        // per-SparkContext UUID subdir appended, so compare by path
        // substring and set only when unset or pointed elsewhere
        val sc = spark.sparkContext
        val path = dir.stripSuffix("/").replaceFirst("^[a-z0-9+.-]+:(//)?", "")
        if (!sc.getCheckpointDir.exists(_.contains(path)))
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
