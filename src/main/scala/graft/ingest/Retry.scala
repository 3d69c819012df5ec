package graft.ingest

/** Driver-level retry for source reads and sink commits — the engine
  * policy for the reference's Prefect task retries (SURVEY.md §2.9 R1:
  * `retries=2/3, retry_delay_seconds=5` on read/upsert tasks). Spark
  * already retries *tasks* (`spark.task.maxFailures`); this covers the
  * failures tasks can't — a landing file mid-upload, a flaky object
  * store listing, a sink directory briefly locked — by re-running the
  * whole action.
  *
  * Retries only on exceptions matching `shouldRetry` (default: any
  * non-fatal); rethrows the last failure when attempts are exhausted.
  */
object Retry {

  def withRetries[A](
      attempts: Int = 3,
      delayMillis: Long = 5000L,
      shouldRetry: Throwable => Boolean = _ => true)(f: => A): A = {
    require(attempts >= 1, "attempts must be >= 1")
    var remaining = attempts
    var last: Throwable = null
    while (remaining > 0) {
      try return f
      catch {
        case e if scala.util.control.NonFatal(e) && shouldRetry(e) =>
          last = e
          remaining -= 1
          if (remaining > 0) {
            System.err.println(
              s"[retry] attempt failed (${e.getClass.getSimpleName}: ${e.getMessage}); " +
                s"$remaining attempt(s) left")
            Thread.sleep(delayMillis)
          }
      }
    }
    throw last
  }
}
