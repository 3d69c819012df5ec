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
  *
  * RETENTION (reliable mode): Spark never deletes reliable checkpoint
  * files on its own — each pin() of an iterative loop leaves its round's
  * state under the dir for the life of the application unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` is set (a
  * STATIC conf: it must be on the SparkConf before the context is
  * built, so this object cannot retrofit it). For multi-hour 100 TB
  * runs either set that conf at submit time, or provision the
  * checkpoint dir for rounds × state-size and clean it after the job —
  * the state pinned per round is the aggregated loop state (labels,
  * ranks), so the per-round footprint is vertex-set-, not corpus-sized.
  */
object Checkpoints {

  val DirConf = "spark.graft.checkpointDir"

  /** Pin `df` per the session's configured mode (see object doc). */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        // setCheckpointDir stores a fully-qualified URI with a
        // per-SparkContext UUID subdir appended. Recover the configured
        // root by stripping the scheme and the UUID leaf, then compare
        // paths for EQUALITY — substring matching kept checkpointing to
        // a stale dir whenever the new root was a prefix/substring of
        // the old one (/data/ckpt after /data/ckpt-old).
        val sc = spark.sparkContext
        def norm(p: String) =
          p.replaceFirst("^[a-z0-9+.-]+:(//)?", "").stripSuffix("/")
        val want = norm(dir)
        val currentRoot = sc.getCheckpointDir.map(norm).map { d =>
          val cut = d.lastIndexOf('/')
          if (cut > 0) d.substring(0, cut) else d
        }
        if (!currentRoot.contains(want)) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
