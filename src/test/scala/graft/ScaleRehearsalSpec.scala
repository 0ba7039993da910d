package graft

import java.nio.file.Files

import graft.helium.SparkSuite

/** Env-gated 10× scale rehearsal: forks [[ScaleRehearsal]] into its own
  * JVM with the heap pinned to 2g and asserts the p01 build and the d24
  * delta cycle complete over a 50k-doc corpus under that bound — the
  * executable form of "no stage collects corpus-scale state
  * driver-side". Runs once per advance mode (rewrite and LSM delta), so
  * both nightly paths carry the bound. Wall times land in the test
  * report (and IMPLEMENTATION.md records a reference run). */
class ScaleRehearsalSpec extends SparkSuite {

  private def rehearse(conf: Option[String]): String = {
    val work = Files.createTempDirectory("rehearsal").toString
    val javaBin = sys.props("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin, "-Xmx2g",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC") ++
      addOpens ++
      Seq("-cp", sys.props("java.class.path"), "graft.ScaleRehearsal", work)
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    conf.foreach(pb.environment().put("SPARK_GRAFT_CONF", _))
    val out = new StringBuilder
    val proc = pb.start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    var json: Option[String] = None
    while (line != null) {
      if (line.startsWith("""{"metric":"scale_rehearsal"""")) json = Some(line)
      else out.append(line).append('\n')
      line = reader.readLine()
    }
    val rc = proc.waitFor()
    assert(rc == 0, s"rehearsal JVM exited $rc:\n${out.takeRight(4000)}")
    json.getOrElse(fail(s"no rehearsal JSON:\n${out.takeRight(4000)}"))
  }

  private def check(j: String): Unit = {
    def field(k: String): Double =
      s""""$k":([0-9.Ee+-]+)""".r.findFirstMatchIn(j)
        .getOrElse(fail(s"missing $k in $j")).group(1).toDouble
    assert(field("docs") == 50000.0, j)
    assert(field("heap_mb") <= 2200.0,
      s"heap not pinned low — the bound is the point: $j")
    assert(field("p01_rows") > 0, j)
    assert(field("d24_rows") > 0, j)
    assert(field("adv_rows") > 0, j)
    assert(field("p04_rows") > 0, j)
    assert(field("p04_secs") < field("p01_secs"),
      s"the incremental night should beat the full rebuild at 10x: $j")
    assert(field("feed_readers") == 64.0,
      s"training feed lost reader ranks at 10×: $j")
    assert(field("feed_mat_files") == 16.0,
      s"materialized feed lost its one-file-per-rank layout at 10×: $j")
    assert(field("m12_rows") > 0, j)
    assert(field("m12_adv_rows") > 0, j)
    // the stream bridge leg: hydration completed under the bound and
    // actually materialized banded-index-scale state; both postures
    // folded fresh docs (exact re-crawls suppressed in both)
    assert(field("stream_state_rows") > 100000,
      s"bootstrap hydration did not materialize banded state: $j")
    assert(field("stream_folded") > 0 && field("stream_folded") <= 600,
      s"stream fold admitted outside the ~516-doc fresh slice: $j")
    assert(field("stream_bf_folded") > 100 &&
      field("stream_bf_folded") <= 600,
      s"bootstrap-free fold: expected ~516 fresh admits with the exact " +
        s"re-crawls suppressed by the per-batch verdict join: $j")
    // the corpus micro-night leg: three stream batches landed as
    // committed night partitions, and compaction shrank the file
    // count without changing the served rows (row preservation is
    // require()d inside the rehearsal itself)
    assert(field("corpus_rows") > 0, j)
    assert(field("corpus_files_after") < field("corpus_files_before"),
      s"night compaction did not shrink the corpus file count: $j")
    assert(field("corpus_files_after") <= 16.0,
      s"the compacted night must hold ~one file per shard: $j")
    assert(field("reconcile_bad") == 0.0,
      s"served-not-banned violations on a healthy 10x lifecycle: $j")
    assert(field("ann_vecs") == 20000.0, j)
    assert(field("ann_serve_rows") > 0, j)
    assert(field("ann_serve2_rows") >= field("ann_serve_rows"),
      s"post-append serve lost results: $j")
    assert(field("s24_rows") == 20000.0, j)
    assert(field("s24_adv_rows") > 0, j)
    info(j)
  }

  test("10x sf0.1 corpus: p01 + d24 delta complete under a 2g heap " +
    "(gated: GRAFT_SLOW_SPECS=1)") {
    assume(sys.env.get("GRAFT_SLOW_SPECS").contains("1"),
      "slow spec — enable with GRAFT_SLOW_SPECS=1")
    check(rehearse(None))
  }

  test("same rehearsal through the LSM delta advance " +
    "(gated: GRAFT_SLOW_SPECS=1)") {
    assume(sys.env.get("GRAFT_SLOW_SPECS").contains("1"),
      "slow spec — enable with GRAFT_SLOW_SPECS=1")
    check(rehearse(Some("spark.graft.index.advanceMode=delta")))
  }
}
