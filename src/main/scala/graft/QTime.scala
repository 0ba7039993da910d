package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-query timing harness for perf triage (not in the driver
  * contract; run via `runMain graft.QTime <names...>`). */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    for (rep <- 1 to 3; name <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[qtime] rep$rep $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
