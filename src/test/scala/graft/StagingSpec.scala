package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Staging

/** Key-shape contract of [[Staging]]: invocation keys are unique even
  * under concurrency (the clobber-proofing for overwrite-and-read
  * stages), shared keys are stable (the reuse contract for memoized
  * stages), and both keys separate scales.
  */
class StagingSpec extends AnyFunSuite {

  test("invocationDir is unique per call, including across threads") {
    val n = 64
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (1 to n).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = Staging.invocationDir("graft_spec_stage", "/x/sf0.001")
        })
      }
      val dirs = futs.map(_.get())
      assert(dirs.distinct.size == n, "two invocations shared a staging dir")
      assert(dirs.forall(_.contains("sf0.001")))
    } finally { pool.shutdown(): Unit }
  }

  test("sharedDir is stable per (prefix, scale) and separates scales") {
    val a = Staging.sharedDir("graft_spec_stage", "/x/sf0.001")
    assert(a == Staging.sharedDir("graft_spec_stage", "/x/sf0.001"))
    assert(a != Staging.sharedDir("graft_spec_stage", "/x/sf0.01"))
    assert(a != Staging.invocationDir("graft_spec_stage", "/x/sf0.001"))
  }

  test("sweepInvocationDirs removes materialized stores eagerly") {
    val d = Staging.invocationDir("graft_spec_sweep", "/x/sf0.001")
    val p = java.nio.file.Paths.get(d)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.writeString(p.resolve("part-0"), "store bytes")
    assert(java.nio.file.Files.exists(p))
    assert(Staging.sweepInvocationDirs() >= 1)
    assert(!java.nio.file.Files.exists(p),
      "invocation dir must be gone after the driver's post-query sweep")
    // a second sweep is a no-op for already-removed dirs
    val before = Staging.sweepInvocationDirs()
    assert(before >= 0)
    assert(!java.nio.file.Files.exists(p))
  }
}
