package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.helium.SparkSuite

/** Library robustness, part four: the events-analytics surface on rows
  * with NULL timestamps / users / types / payloads. Unlike the media
  * and vector boundaries (which needed guards), the event queries are
  * null-safe by construction — aggregations skip nulls, windows sort
  * them deterministically, json extraction of NULL is NULL. This spec
  * pins that property so a future event operator cannot silently lose
  * it. */
class DirtyEventsSpec extends SparkSuite {

  private lazy val dirtyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("dirtyev").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val ev = Tables.events(spark, src)
    val maxTs = ev.agg(max(col("ts"))).head().get(0)
    val dirty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(900001L, null, 17L, "click", 1.0, """{"k":1}"""),
        Row(900002L, maxTs, null, null, null, null))),
      ev.schema)
    ev.unionByName(dirty)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every event-analytics query runs over null-ts/user/type/payload " +
    "rows") {
    val eventQueries = Seq("q11_time_bucket_daily", "q12_json_extract_agg",
      "q13_sessionize", "q14_asof_prev_click", "q24_funnel_stages",
      "q32_first_last_event", "q33_cohort_retention", "q34_trailing_window",
      "q38_ignore_nulls_nav", "q42_gap_fill_calendar", "q45_skew_report")
    val failures = eventQueries.flatMap { name =>
      val r =
        try { SparkEntry.queries(name)(spark, dirtyDir).count(); None }
        catch { case e: Throwable => Some(name -> e.toString.take(200)) }
      Pinned.releaseAll(spark)
      r
    }
    assert(failures.isEmpty,
      s"${failures.size} event queries die on dirty rows:\n" +
        failures.map { case (n, e) => s"  $n: $e" }.mkString("\n"))
  }
}
