package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.helium.SparkSuite

class EventWindowsSpec extends SparkSuite {
  import spark.implicits._

  test("streaming daily rollup: append-mode windows equal batch q11 on " +
    "the shared columns once every window finalizes") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
    val rows = ev.withColumn("ts_us", graft.Tables.epochUs(ev))
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventWindows.Ev].collect().sortBy(_.ts.getTime)
    assert(rows.nonEmpty)

    val input = MemoryStream[EventWindows.Ev]
    val q = EventWindows.dailyCounts(input.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("daily_out").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a.toSeq: _*); q.processAllAvailable()
      input.addData(b.toSeq: _*); q.processAllAvailable()
      // two sentinel events far past the data finalize every real
      // window: the first advances the watermark past the last real
      // day, the second triggers the emitting batch under it
      val maxTs = rows.last.ts.getTime
      (2 to 3).foreach { k =>
        input.addData(EventWindows.Ev(-k.toLong,
          new java.sql.Timestamp(maxTs + k * 86400000L), -1L,
          "__sentinel", 0.0))
        q.processAllAvailable()
      }
      val streamed = spark.table("daily_out")
        .filter(col("event_type") =!= "__sentinel")
        .as[(java.sql.Date, String, Long, Double)].collect()
        .map(r => (r._1.toString, r._2) -> ((r._3, r._4))).toMap
      val batch = graft.SparkEntry
        .queries("q11_time_bucket_daily")(spark, sf)
        .select(col("day"), col("event_type"), col("n_events"),
          col("sum_value"))
        .as[(java.sql.Date, String, Long, Double)].collect()
        .map(r => (r._1.toString, r._2) -> ((r._3, r._4))).toMap
      assert(streamed == batch,
        s"stream ${streamed.size} windows != batch ${batch.size}: " +
          s"missing ${(batch.keySet -- streamed.keySet).take(5)}, " +
          s"extra ${(streamed.keySet -- batch.keySet).take(5)}")
    } finally q.stop()
  }
}
