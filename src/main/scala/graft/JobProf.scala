package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Perf-triage tool (not in the driver contract): per-Spark-job wall
  * times for one query — shows where a multi-action pipeline spends.
  *
  * Usage: `runMain graft.JobProf <name> [reps]`; env as in [[Bench]].
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProf <query> [reps]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.applyEnvConf(spark)
    val name = SparkEntry.queries.keys
      .find(k => k == args(0) || k.takeWhile(_ != '_') == args(0)).get
    val starts = mutable.Map.empty[Int, (Long, String)]
    val done = mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts(j.jobId) = (System.nanoTime(), desc); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, desc) =>
          done += ((j.jobId, (System.nanoTime() - t0) / 1e9, desc)); ()
        }
    })
    for (rep <- 1 to reps) {
      done.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Pinned.releaseAll(spark)
      Thread.sleep(300)
      if (rep == reps) {
        done.sortBy(_._1).foreach { case (id, dt, desc) =>
          println(f"[jobprof] job=$id%3d ${dt}%7.3f s  ${desc.take(90)}")
        }
        println(f"[jobprof] TOTAL $name rep$rep ${total}%.3f s " +
          f"jobs=${done.size} jobsum=${done.map(_._2).sum}%.3f")
      }
    }
    spark.stop()
  }
}
