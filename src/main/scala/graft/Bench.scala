package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line of per-query wall times.
  *
  * Two passes: an uncounted warmup (JIT, codegen cache, page cache, AQE
  * stats) then the measured pass. Reported numbers are steady-state query
  * cost, not JVM start-up — the regime that matters at cluster scale.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Iteration knobs (unset in driver runs): SPARK_GRAFT_ONLY=d05,t06
    // restricts to the named queries (short or full ids) so a variant can
    // be timed without the other ~95 queries; SPARK_GRAFT_CONF=k=v,k=v
    // applies session conf overrides (e.g. the dedup df-prefilter flag).
    SparkEntry.applyEnvConf(spark)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').filter(_.nonEmpty).toSet)
    val queries = only match {
      case Some(ids) =>
        // a typo'd filter must fail loudly, not print a perfect-looking
        // 0.000-second bench of zero queries
        val matched = SparkEntry.queries.filter { case (k, _) =>
          ids(k) || ids(k.takeWhile(_ != '_')) }
        val unmatched = ids.filterNot(id => SparkEntry.queries.keys
          .exists(k => k == id || k.takeWhile(_ != '_') == id))
        require(unmatched.isEmpty,
          s"SPARK_GRAFT_ONLY entries match no query: ${unmatched.mkString(", ")}")
        // an EMPTY filter (SPARK_GRAFT_ONLY="") passes the unmatched check
        // vacuously and would print a perfect-looking 0.000s/0-failure run
        require(matched.nonEmpty,
          "SPARK_GRAFT_ONLY is set but selects zero queries")
        matched
      case None => SparkEntry.queries
    }

    // Fail fast on duplicate short ids BEFORE any timing: a duplicate
    // prefix would silently drop a timing from the JSON map, and
    // discovering that only after a ~40 s measured run wastes the run.
    // (QuerySurfaceSpec checks the same invariant statically.)
    val shortIds = queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    require(shortIds.distinct.size == shortIds.size,
      "duplicate short query ids would silently drop a timing: " +
        shortIds.groupBy(identity).filter(_._2.size > 1).keys.mkString(", "))

    // A failed query must POISON the bench, not flatter it: a query that
    // dies in 50 ms would otherwise "improve" the total. A failed pass
    // reports +inf (never enters the per-query min), and failures are
    // counted over MEASURED passes only — a warmup-only hiccup doesn't
    // condemn timings that are all valid — then emitted in the JSON.
    val failed = scala.collection.mutable.Set.empty[String]
    def runAll(measured: Boolean): Map[String, Double] =
      queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            if (measured) failed += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // Per-query pins are for multi-scan reuse WITHIN a query;
        // release between queries so 127 queries' cached blocks don't
        // accumulate (and distort later queries' memory budget).
        // Pinned.releaseAll drops exactly what graft pinned — the
        // library-clean alternative to clearCache().
        Pinned.releaseAll(spark)
        name -> (if (ok) dt else Double.PositiveInfinity)
      }.toMap

    runAll(measured = false) // warmup pass (uncounted)

    // Self-calibration sentinel: the pinned trivial query (q20 — string
    // funcs over a constant-size dimension table, data-size-insensitive
    // across sf) timed once, warm, between the warmup and the measured
    // passes. On an idle host it runs in well under [[CalSteadySec]];
    // when the sample exceeds 3x that, the whole run is marked hot —
    // r7's bench was poisoned by host load and took a manual same-host
    // A/B to adjudicate, and this field makes that call automatic.
    // A cal failure must not kill the run before its JSON line exists:
    // report the -1 sentinel with hot=1 (an unmeasurable host is an
    // untrustworthy run, same as a hot one) and keep going.
    val calT0 = System.nanoTime()
    val cal =
      try {
        SparkEntry.queries(CalQuery)(spark, sfDir).count()
        (System.nanoTime() - calT0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] calibration failed: ${e.getMessage}")
          -1.0
      }
    Pinned.releaseAll(spark)

    // Two measured passes, per-query MIN: a single GC pause or concurrent
    // host load can inflate one pass 10x (q16 read 14.8s in a driver run
    // whose steady-state is 0.5s); the min of two independent passes is the
    // steady-state cost we actually want to report.
    val pass1 = runAll(measured = true)
    val results = runAll(measured = true).toSeq
      .map { case (k, v) => k -> math.min(v, pass1(k)) }
      // a query that failed BOTH passes has min=inf — report a sentinel
      // -1 (unmistakably not a timing) rather than poisoning the sum
      .map { case (k, v) => k -> (if (v.isInfinity) -1.0 else v) }

    println(jsonLine(results, failed.size, sfDir.split('/').last, cal))
    spark.stop()
  }

  /** The pinned calibration query — trivial, stable, constant-size input
    * at every sf, so its warm wall time measures the HOST, not the data. */
  private[graft] val CalQuery = "q20_string_funcs"

  /** Steady-state calibration budget (seconds): the warm [[CalQuery]]
    * runs in ~0.15–0.2 s on an idle host at any sf; 3x this flags the
    * run as host-noise-poisoned (`"hot":1` in the JSON line). */
  private[graft] val CalSteadySec = 0.25

  private[graft] def calHot(calSec: Double): Boolean =
    calSec < 0 || calSec > 3 * CalSteadySec

  /** The one JSON line the driver parses — kept under its 2000-char tail
    * capture (BENCH_r02 was truncated mid-line at ~2.4KB and failed to
    * parse): short query ids (the prefix before the first '_' is unique
    * across the surface), basename-only sf, and ADAPTIVE per-query
    * precision. 141 queries at 3 decimals is 1805 chars — still inside
    * the budget but with <~8 queries of headroom — so when the
    * 3-decimal render would cross [[LineBudget]] the per-query values
    * degrade to 2 decimals (then 1) and the line says so via
    * `"prec":N`; the 2-decimal tier alone re-opens ~20 queries of
    * room. Headline
    * `value`/`cal` keep 3 decimals at every precision tier: they are
    * the cross-round comparables, and two fixed fields cost no
    * meaningful budget. Graceful degradation beats a mid-line cut: a
    * truncated line is unparseable, a 2-decimal line loses nothing the
    * min-of-2-reps protocol can resolve anyway (sub-10ms deltas on
    * sub-second queries are host noise, see [[CalSteadySec]]).
    * 1940 (was 1900): the r16 streaming addition (x01) made the
    * 149-entry 3-decimal render 1901 chars — one over the old budget —
    * and degrading EVERY query to 2 decimals for that would coarsen the
    * cross-round per-query ratios; 1940 restores 3-decimal rendering
    * and still leaves 60 chars of slack under the driver's 2000-char
    * tail capture. Constant only — passes, timing, and the JSON shape
    * are unchanged. */
  private[graft] val LineBudget = 1940

  private[graft] def jsonLine(results: Seq[(String, Double)], failures: Int,
      sfName: String, calSec: Double): String = {
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    def render(prec: Int): String = {
      def fq(v: Double): String =
        s"%.${prec}f".formatLocal(java.util.Locale.ROOT, v)
      val qs = results.map { case (k, v) =>
        "\"" + k.takeWhile(_ != '_') + "\":" + fq(v)
      }.mkString("{", ",", "}")
      // "reps":2 documents the measurement policy in the artifact itself:
      // every per-query number is the MIN of two measured passes (after
      // an uncounted warmup), the jitter-kill for sub-second queries
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failures":$failures,""" +
        s""""cal":${fmt(calSec)},"hot":${if (calHot(calSec)) 1 else 0},"reps":2,""" +
        (if (prec < 3) s""""prec":$prec,""" else "") +
        s""""queries":$qs,"sf":"$sfName"}"""
    }
    val line = (3 to 1 by -1).iterator.map(render)
      .find(_.length <= LineBudget)
      .getOrElse(render(1))
    if (line.length > LineBudget)
      System.err.println(s"[bench] WARNING: json line ${line.length} chars — " +
        "driver tail captures 2000; even 1-decimal render exceeds budget")
    line
  }
}
