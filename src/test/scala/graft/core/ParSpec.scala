package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** [[Par.both]] is the §2.6 overlap primitive under every flow
  * builder's independent construction pair — its join/error contract
  * must hold exactly, or a failed staging could leak a live thread
  * into the next step (clobbering a store mid-write) or vanish
  * silently.
  */
final class ParSpec extends AnyFunSuite {

  test("both returns both results") {
    assert(Par.both(1 + 1, "x" * 3) === ((2, "xxx")))
  }

  test("both really overlaps (b runs while a is still in flight)") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    // a blocks until b has started: only true concurrency can finish
    val (_, _) = Par.both(
      assert(gate.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "b never started while a was waiting — no overlap"),
      gate.countDown())
  }

  test("b's failure propagates after a completed") {
    val boom = intercept[RuntimeException] {
      Par.both(42, throw new RuntimeException("b failed"))
    }
    assert(boom.getMessage === "b failed")
  }

  test("a's failure wins; b's is suppressed onto it, and b is joined") {
    @volatile var bFinished = false
    val boom = intercept[RuntimeException] {
      Par.both(
        throw new RuntimeException("a failed"),
        { Thread.sleep(50); bFinished = true; throw new RuntimeException("b failed") })
    }
    assert(boom.getMessage === "a failed")
    assert(bFinished, "caller returned before b's thread was joined")
    assert(boom.getSuppressed.map(_.getMessage).toSeq === Seq("b failed"))
  }

  test("no work leaks past the call: b is always joined") {
    @volatile var done = false
    Par.both((), { Thread.sleep(30); done = true }): Unit
    assert(done)
  }
}
