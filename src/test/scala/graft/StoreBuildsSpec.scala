package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The StoreBuilds ledger is what makes BENCH_BUILDS / the metric
  * line's `builds` map trustworthy — pin its attribution contract:
  * per-store accumulation, nesting (an inner stage resolved BEFORE an
  * outer timed block must not double-count into it), and that a
  * cache HIT never touches the ledger.
  */
class StoreBuildsSpec extends AnyFunSuite with Matchers {

  private def spin(ms: Long): Unit = {
    val end = System.nanoTime() + ms * 1000000L
    while (System.nanoTime() < end) {}
  }

  test("timed records per-store wall-clock and accumulates across builds") {
    StoreBuilds.clear()
    StoreBuilds.timed("spec_a") { spin(30) }
    StoreBuilds.timed("spec_a") { spin(30) }
    StoreBuilds.timed("spec_b") { spin(10) }
    val m = StoreBuilds.snapshot.toMap
    m("spec_a") should be >= 0.055
    m("spec_b") should be >= 0.009
    m("spec_b") should be < m("spec_a")
    StoreBuilds.clear()
  }

  test("resolve-inner-first keeps nested stage builds from double-counting") {
    StoreBuilds.clear()
    // the MsPipeline/GraphOps pattern: the inner store resolves before
    // the outer timed block, so the outer entry carries ONLY its own
    // work — the misattribution this prevents is the outer store
    // absorbing the inner build on a shared cold path
    val cache = scala.collection.concurrent.TrieMap.empty[String, Long]
    def inner(): Long = cache.getOrElseUpdate("k",
      StoreBuilds.timed("spec_inner") { spin(60); 1L })
    def outer(): Long = {
      val i = inner() // resolved BEFORE the outer block is timed
      StoreBuilds.timed("spec_outer") { spin(20); i + 1 }
    }
    outer() shouldBe 2L
    val m = StoreBuilds.snapshot.toMap
    m("spec_inner") should be >= 0.055
    // the outer entry must NOT contain the inner's ~60 ms. RELATIVE
    // bound, not an absolute 55 ms cap: on a preempted CI box the
    // outer 20 ms spin can legitimately stretch past any fixed cap,
    // but absorbing the inner build would push it past the inner's
    // own (equally-stretched) wall-clock — the misattribution, not
    // scheduler jitter, is what fails this
    m("spec_outer") should be < m("spec_inner")
    StoreBuilds.clear()
  }

  test("a cache hit never touches the ledger") {
    StoreBuilds.clear()
    val cache = scala.collection.concurrent.TrieMap.empty[String, Long]
    def get(): Long = cache.getOrElseUpdate("k",
      StoreBuilds.timed("spec_hit") { spin(20); 7L })
    get() shouldBe 7L
    val after1 = StoreBuilds.snapshot.toMap.apply("spec_hit")
    get() shouldBe 7L
    StoreBuilds.snapshot.toMap.apply("spec_hit") shouldBe after1
    StoreBuilds.clear()
  }
}
