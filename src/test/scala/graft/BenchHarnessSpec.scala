package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's child-process discipline: the DuckDB baseline
  * subprocess is best-effort context — a wedged or failing child must
  * degrade to the "baseline unavailable" path (None) within the
  * bound, never stall the whole bench run. */
class BenchHarnessSpec extends AnyFunSuite {

  test("a wedged child is killed at the bound and reports None") {
    val t0 = System.nanoTime()
    val out = Bench.boundedRun(Seq("sleep", "300"), 1500)
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(out.isEmpty, "a timed-out child must not produce a result")
    assert(elapsed < 30.0, f"degraded in $elapsed%.1f s, not the bound")
  }

  test("a healthy child's stdout comes back whole") {
    assert(Bench.boundedRun(Seq("echo", "42 7"), 30000)
      .map(_.trim).contains("42 7"))
  }

  test("a failing child (non-zero exit) reports None, not garbage") {
    assert(Bench.boundedRun(
      Seq("python3", "-c", "import sys; print('partial'); sys.exit(3)"),
      30000).isEmpty)
  }

  test("the flat per-query JSON line parses; garbage degrades to empty") {
    assert(Bench.parseFlatJsonDoubles("""{"q1_agg":0.12,"q2_x":3.0}""") ==
      Map("q1_agg" -> 0.12, "q2_x" -> 3.0))
    assert(Bench.parseFlatJsonDoubles("not json at all").isEmpty)
    assert(Bench.parseFlatJsonDoubles("{}").isEmpty)
  }
}
