package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession

/** Perf-triage tool (not in the driver contract): dump
  * `.explain("formatted")` for the named queries to text files.
  *
  * Usage: `runMain graft.PlanDump <outDir> <suffix> [names...]`
  * writes `<outDir>/<query>_<suffix>.txt` per query (short or full ids;
  * no names = every declared query). `SPARK_GRAFT_SF_DIR` /
  * `SPARK_GRAFT_CPUS` / `SPARK_GRAFT_CONF` behave as in [[Bench]].
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [names...]")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val suffix = args(1)
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
    SparkEntry.applyEnvConf(spark)
    val ids = args.drop(2).toSet
    val picked =
      if (ids.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) =>
        ids(k) || ids(k.takeWhile(_ != '_')) }
    require(picked.nonEmpty, "no queries matched")
    picked.foreach { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
      Pinned.releaseAll(spark)
      Files.write(outDir.resolve(s"${name.takeWhile(_ != '_')}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] $name -> ${name.takeWhile(_ != '_')}_$suffix.txt")
    }
    spark.stop()
  }
}
