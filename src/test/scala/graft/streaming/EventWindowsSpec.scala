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
      val out = spark.table("daily_out")
        .filter(col("event_type") =!= "__sentinel")
        .as[(java.sql.Date, String, Long, Long, Double)].collect()
      val streamed = out
        .map(r => (r._1.toString, r._2) -> ((r._3, r._5))).toMap
      val approxUsers = out
        .map(r => (r._1.toString, r._2) -> r._4).toMap
      val batchRows = graft.SparkEntry
        .queries("q11_time_bucket_daily")(spark, sf)
        .select(col("day"), col("event_type"), col("n_events"),
          col("n_users"), col("sum_value"))
        .as[(java.sql.Date, String, Long, Long, Double)].collect()
      val batch = batchRows
        .map(r => (r._1.toString, r._2) -> ((r._3, r._5))).toMap
      assert(streamed == batch,
        s"stream ${streamed.size} windows != batch ${batch.size}: " +
          s"missing ${(batch.keySet -- streamed.keySet).take(5)}, " +
          s"extra ${(streamed.keySet -- batch.keySet).take(5)}")
      // bound certificate (the q22 discipline): every window's HLL
      // estimate lands within 5 sigma of q11's exact distinct on the
      // same rows — rsd 0.05, so |approx - exact| <= ceil(25% of exact)
      // with a +1 floor for tiny windows where one register flip
      // dominates. Deterministic: HLL++ is a pure fold, no sampling.
      batchRows.foreach { r =>
        val key = (r._1.toString, r._2)
        val exact = r._4
        val approx = approxUsers(key)
        val bound = math.max(1L, math.ceil(
          exact * 5 * EventWindows.Rsd).toLong)
        assert(math.abs(approx - exact) <= bound,
          s"window $key: approx $approx vs exact $exact exceeds ±$bound")
      }
    } finally q.stop()
  }
}
