package graft.core

/** Overlap INDEPENDENT Spark jobs from the driver (optimization guide
  * §2.6): the scheduler happily runs several jobs at once inside one
  * application — actions are sequential only because driver code calls
  * them sequentially. The flow builders run many small, low-parallelism
  * construction jobs (landing-dir stagings, store first loads, consumer
  * resumes) whose task counts never fill the cluster; submitting two
  * independent ones together lets the second back-fill the first's
  * scheduling gaps and stage tails, on local[n] exactly as on a
  * 1000-executor cluster. Default FIFO scheduling gives the earlier
  * job resources first — precisely the back-fill behaviour wanted —
  * and two jobs in flight is the guide's sweet spot.
  *
  * Correctness scope: callers must only pair steps with DISJOINT
  * effects (different staging dirs, different StateTable roots). The
  * single-writer-per-store guarantee (`StateTable.overwrite`) is
  * preserved — parallelism here is across stores, never within one.
  * Results are unchanged; only the submission order overlaps.
  */
object Par {

  /** Run `a` and `b` concurrently (b on a fresh thread — Spark job
    * properties are inherited at thread creation), return both. The
    * caller's thread is always joined before returning, so no work
    * leaks past the call; if both sides fail, `a`'s error wins and
    * `b`'s is suppressed onto it.
    */
  def both[A, B](a: => A, b: => B): (A, B) = {
    val bRes = new java.util.concurrent.atomic.AtomicReference[Either[Throwable, B]]()
    val t = new Thread(
      () => bRes.set(try Right(b) catch { case e: Throwable => Left(e) }),
      "graft-par")
    t.start()
    val aRes =
      try a
      catch {
        case e: Throwable =>
          t.join()
          bRes.get() match {
            case Left(be) if be ne e => e.addSuppressed(be)
            case _ => ()
          }
          throw e
      }
    t.join()
    bRes.get() match {
      case Right(bv) => (aRes, bv)
      case Left(e) => throw e
    }
  }
}
