package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench self-calibration sentinel: a pinned trivial query timed
  * between warmup and the measured passes, emitted as `cal`/`hot` in the
  * one JSON line, so a host-noise-poisoned run flags itself instead of
  * requiring a manual same-host A/B to adjudicate. */
class BenchSentinelSpec extends AnyFunSuite {

  test("the pinned calibration query exists in the query surface") {
    assert(SparkEntry.queries.contains(Bench.CalQuery))
  }

  test("hot flag trips strictly above 3x the steady-state budget, and on " +
    "the -1 failed-calibration sentinel") {
    assert(!Bench.calHot(0.0))
    assert(!Bench.calHot(Bench.CalSteadySec))
    assert(!Bench.calHot(3 * Bench.CalSteadySec))
    assert(Bench.calHot(3 * Bench.CalSteadySec + 0.001))
    assert(Bench.calHot(10.0))
    // a cal query that THREW reports -1 — unmeasurable host, treat as hot
    assert(Bench.calHot(-1.0))
  }

  test("json line carries cal and hot, excludes failure sentinels from the total") {
    val results = Seq("q20_string_funcs" -> 0.2, "d05_jaccard" -> 1.0,
      "q99_dead" -> -1.0)
    val hot = Bench.jsonLine(results, 1, "sf0.1", 0.9)
    assert(hot.contains("\"cal\":0.900"))
    assert(hot.contains("\"hot\":1"))
    assert(hot.contains("\"failures\":1"))
    assert(hot.contains("\"value\":1.200")) // -1 sentinel not summed
    assert(hot.contains("\"q99\":-1.000")) // but still reported per-query
    val cold = Bench.jsonLine(results, 0, "sf0.1", 0.18)
    assert(cold.contains("\"hot\":0"))
    assert(cold.contains("\"cal\":0.180"))
    // the rep policy rides in the artifact (min of 2 measured passes)
    assert(cold.contains("\"reps\":2"))
  }
}
