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

  test("per-query precision degrades before the line can cross the " +
    "driver's tail-capture budget, and says so via prec") {
    // small surface: 3-decimal render fits, no prec field
    val small = Bench.jsonLine(Seq("q01_a" -> 0.123456), 0, "sf0.1", 0.18)
    assert(small.contains("\"q01\":0.123") && !small.contains("\"prec\""))
    // a surface wide enough that 3 decimals would blow the budget:
    // 160 entries x ~13 chars + ~100 prefix ≈ 2180 > 1900, 2 decimals
    // ≈ 2020 > 1900, 1 decimal ≈ 1860 fits
    val wide = (1 to 160).map(i => f"w$i%03d_q" -> 0.123456)
    val line = Bench.jsonLine(wide, 0, "sf0.1", 0.18)
    assert(line.length <= Bench.LineBudget, s"line ${line.length} chars")
    assert(line.contains("\"prec\":1"), line.take(120))
    assert(line.contains("\"w001\":0.1"))
    // headline value/cal keep 3 decimals at every tier
    assert(line.contains("\"cal\":0.180"))
    assert(line.contains(s""""value":${"%.3f".format(0.123456 * 160)}"""))
    // the current real surface still renders at full precision
    val real = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 0.123456)
    val realLine = Bench.jsonLine(real, 0, "sf0.1", 0.18)
    assert(realLine.length <= Bench.LineBudget)
    assert(realLine.contains(":0.123"), "real surface should render 3-decimal")
  }
}
