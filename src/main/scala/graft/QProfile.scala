package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Perf-triage tool (not in the driver contract): per-query cost split.
  *
  * For each named query, reports per rep:
  *   - build: seconds to construct the DataFrame (includes any eager work
  *     a composed pipeline does inside its builder — writes, checkpoints)
  *   - plan: seconds to force queryExecution.executedPlan
  *   - exec: seconds for the final count()
  *   - jobs/stages/tasks launched during the whole rep
  *
  * Usage: `runMain graft.QProfile <names...>`; env as in [[Bench]].
  */
object QProfile {
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
    SparkEntry.applyEnvConf(spark)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks); ()
      }
    })
    val names = if (args.nonEmpty) args.toSeq.flatMap { id =>
      SparkEntry.queries.keys.find(k => k == id || k.takeWhile(_ != '_') == id)
    } else SparkEntry.queries.keys.toSeq
    for (rep <- 1 to 3; name <- names) {
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      Pinned.releaseAll(spark)
      // listener events are async; give the bus a beat before reading
      Thread.sleep(200)
      println(f"[qprof] rep$rep $name build=${(t1 - t0) / 1e9}%.3f " +
        f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f " +
        f"total=${(t3 - t0) / 1e9}%.3f jobs=${jobs.get} " +
        f"stages=${stages.get} tasks=${tasks.get}")
    }
    spark.stop()
  }
}
