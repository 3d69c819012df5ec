package graft.core

/** Per-process tmp staging for judged queries that materialize an
  * intermediate store (q74 partitioned event store, q92 format
  * roundtrip). The key carries two invariants:
  *  - the source dir's LEAF (sf0.001/sf0.01/sf0.1), so sessions on
  *    different scales never read each other's store;
  *  - the JVM pid, so two concurrent processes on the same scale can't
  *    overwrite each other's store mid-scan.
  * Callers write with mode("overwrite"), so repeated runs within one
  * process are idempotent and tmp growth is bounded by process count.
  *
  * CONTRACT: judged queries run single-threaded per process (Verify and
  * Bench are both sequential mains). Two concurrent executions of the
  * same query inside ONE process would share a key and could clobber
  * each other's store mid-scan — a threaded driver must add its own
  * per-invocation token to `prefix`.
  */
object Staging {
  def dir(prefix: String, sfDir: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      prefix + "_" + new java.io.File(sfDir).getName +
        "_" + ProcessHandle.current().pid()).toString
}
