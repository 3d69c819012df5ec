package graft.core

/** Per-process tmp staging for judged queries that materialize an
  * intermediate store. Two key shapes, one per caller class:
  *
  *  - [[sharedDir]] — stable per (prefix, scale, pid). For MEMOIZED
  *    stages whose content is a pure function of the source scale
  *    (blob corpora, physical layouts): the caller owns a `_STAGED`
  *    marker + `synchronized` block, so concurrent executions in one
  *    process converge on one build instead of clobbering.
  *  - [[invocationDir]] — the stable key plus a process-unique token,
  *    fresh per call. For OVERWRITE-AND-READ stages that are part of
  *    the measured operator (q74 event store, q92 format roundtrip,
  *    q103 index build): two concurrent executions of the same query
  *    in one process now write DISJOINT dirs, so neither can clobber
  *    the other's store mid-scan. Growth is bounded by a shutdown
  *    hook that removes every invocation dir this process created.
  *
  * Both embed the source dir's LEAF (sf0.001/sf0.01/sf0.1) so sessions
  * on different scales never read each other's store, and the JVM pid
  * so concurrent PROCESSES never collide.
  */
object Staging {

  private val tokens = new java.util.concurrent.atomic.AtomicLong(0L)
  private val createdInvocationDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  locally {
    sys.addShutdownHook {
      createdInvocationDirs.forEach { d =>
        try Fs.deleteRecursively(java.nio.file.Paths.get(d))
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }: Unit
  }

  private def base(prefix: String, sfDir: String): String =
    prefix + "_" + new java.io.File(sfDir).getName +
      "_" + ProcessHandle.current().pid()

  /** Stable per (prefix, scale, process): for memoized stages only —
    * the caller must guard the build with a marker + synchronization.
    */
  def sharedDir(prefix: String, sfDir: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"), base(prefix, sfDir)).toString

  /** Fresh per call: concurrent executions of one query in one process
    * get disjoint stores. Removed by [[sweepInvocationDirs]] (called by
    * the sequential drivers between queries) with the process-exit hook
    * as backstop.
    */
  def invocationDir(prefix: String, sfDir: String): String = {
    val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      base(prefix, sfDir) + "_i" + tokens.incrementAndGet()).toString
    createdInvocationDirs.add(d)
    d
  }

  /** Eagerly delete every invocation dir created so far and returns the
    * count removed — called by the SEQUENTIAL driver mains (Verify,
    * Bench) after each query's terminal action, so a long process
    * re-running staged queries holds at most one query's stores instead
    * of accumulating them until JVM exit. A dir is only in this set
    * AFTER its query's result was materialized (the returned DataFrame
    * reads the staged store lazily, so callers must sweep only past the
    * terminal action — which is exactly when the drivers call this).
    * In-process CONCURRENT executions must not use this (it would drop
    * a sibling query's live store mid-scan); they keep the exit hook.
    */
  def sweepInvocationDirs(): Int = {
    var n = 0
    val it = createdInvocationDirs.iterator()
    while (it.hasNext) {
      val d = it.next()
      try {
        Fs.deleteRecursively(java.nio.file.Paths.get(d))
        it.remove()
        n += 1
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    n
  }
}
