package graft

import org.scalatest.Tag

/** The SLOW test tier (r13, VERDICT item 2). The driver's verify window
  * truncated the 33-minute full suite in r12, making a real failure
  * indistinguishable from a timeout, so the default `sbt test` excludes
  * tests tagged here (build.sbt adds `-l graft.Slow` unless
  * GRAFT_SLOW_TESTS is set) and finishes in ~11 minutes with a real
  * summary line. The tagged tests are full-registry sweeps whose value
  * the driver's own Verify + DuckDB oracle gate already duplicates
  * every round; they stay runnable:
  *
  *   GRAFT_SLOW_TESTS=1 sbt "testOnly -- -n graft.Slow"   // slow tier
  *   GRAFT_SLOW_TESTS=1 sbt test                          // everything
  */
object SlowTest extends Tag("graft.Slow")
