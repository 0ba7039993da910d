package graft.helium

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** §2.8 extension surface: event-time windowed aggregation with a
  * watermark over a MemoryStream — the Structured-Streaming capabilities
  * the reference's schema anticipates downstream (SURVEY §2.8 last row). */
class StreamingWindowSpec extends SparkSuite {
  import spark.implicits._

  test("tumbling event-time window with watermark aggregates per window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "kind", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("kind"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))

    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("win_out").start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData((t(0), "a", 1.0), (t(1), "a", 2.0), (t(6), "a", 4.0),
        (t(6), "b", 8.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select(col("window.start").cast("string"), col("kind"), col("n"), col("sv"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "a", 2L, 3.0),
        ("2024-01-01 10:05:00", "a", 1L, 4.0),
        ("2024-01-01 10:05:00", "b", 1L, 8.0)))
    } finally q.stop()
  }

  test("session window: events within 5-minute gaps coalesce into sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "kind", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("kind"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("sess_out").start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      // 10:00, 10:03 chain one session; 10:20 starts another
      input.addData((t(0), "a", 1.0), (t(3), "a", 1.0), (t(20), "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select(col("session_window.start").cast("string"), col("n"))
        .as[(String, Long)].collect().toSet
      assert(rows == Set(("2024-01-01 10:00:00", 2L), ("2024-01-01 10:20:00", 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join: purchases attribute to a prior click within 10 min") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, String)]
    val buys = MemoryStream[(Timestamp, String)]
    // watermarks bound the join state on BOTH sides — without them the
    // runtime must buffer each side forever (the 100 TB failure mode)
    val c = clicks.toDF().toDF("c_ts", "user").withWatermark("c_ts", "20 minutes")
    val b = buys.toDF().toDF("b_ts", "b_user").withWatermark("b_ts", "20 minutes")
    val joined = b.join(c,
      col("user") === col("b_user") &&
        col("c_ts") <= col("b_ts") &&
        col("c_ts") >= col("b_ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("b_user"), col("b_ts").cast("string"), col("c_ts").cast("string"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attr_out").start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      clicks.addData((t(0), "u1"), (t(25), "u2"))
      buys.addData((t(5), "u1"), (t(30), "u1"))
      q.processAllAvailable()
      val rows = spark.table("attr_out").as[(String, String, String)]
        .collect().toSet
      // u1's 10:05 purchase attributes to the 10:00 click; the 10:30
      // purchase is outside every click's 10-minute window; u2 never buys
      assert(rows == Set(("u1", "2024-01-01 10:05:00", "2024-01-01 10:00:00")))
    } finally q.stop()
  }

  test("stream-static join: streaming facts enrich against a static dimension, broadcast") {
    implicit val sqlCtx = spark.sqlContext
    // the allowlist/dimension-enrichment shape: the static side is planned
    // once and broadcast per micro-batch — no streaming state at all
    // (unlike stream-stream, there is nothing to watermark)
    val dim = Seq(("gw1", "us"), ("gw2", "eu")).toDF("gateway", "region")
    val facts = MemoryStream[(String, Long)]
    val joined = facts.toDF().toDF("gateway", "amount")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("gateway"), "left")
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("enrich_out").start()
    try {
      facts.addData(("gw1", 5L), ("gw3", 7L))
      q.processAllAvailable()
      facts.addData(("gw2", 9L))
      q.processAllAvailable()
      val rows = spark.table("enrich_out")
        .select("gateway", "amount", "region")
        .as[(String, Long, Option[String])].collect().toSet
      // unknown gateways survive with a null region (left join, sentinel
      // handling is downstream's choice); known ones enrich
      assert(rows == Set(("gw1", 5L, Some("us")), ("gw3", 7L, None),
        ("gw2", 9L, Some("eu"))))
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark keeps first arrival only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    // the streaming face of d01/d02: state holds one entry per key only
    // within the watermark horizon, so memory is bounded by the horizon's
    // key cardinality, not the stream's
    val deduped = input.toDF().toDF("ts", "content_hash")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData((t(0), "h1"), (t(1), "h1"), (t(2), "h2"))
      q.processAllAvailable()
      input.addData((t(3), "h1"), (t(4), "h3"))
      q.processAllAvailable()
      val rows = spark.table("dedup_out")
        .select(col("content_hash")).as[String].collect().toSeq
      assert(rows.sorted == Seq("h1", "h2", "h3"))
    } finally q.stop()
  }

  test("migrate registers catalog tables over sink output (K6 parity)") {
    val root = java.nio.file.Files.createTempDirectory("migr").toString
    // produce one committed batch through the real pipeline + sink
    val node = new FixtureNode(fixture("basic"))
    val blocks = Follower.parseBlocks(
      (100L to 105L).flatMap(node.getBlockJson).toDF("json"))
    val payloads = Follower.fetchPayloads(spark, node, blocks, Model.EtlMode.Full)
    val out = Pipeline.run(Model.EtlMode.Full, blocks, payloads)
    new ExactlyOnceSink(spark, root).commit(out, 105, 100)

    Migrate.run(spark, root)
    assert(spark.sql("SELECT count(*) FROM rewards").head().getLong(0) == 5)
    assert(spark.sql("SELECT count(*) FROM transactions").head().getLong(0) == 7)
    assert(spark.sql(
      "SELECT sum(amount) FROM rewards WHERE gateway = 'gw2'")
      .head().getLong(0) == 35)
    spark.sql("DROP TABLE IF EXISTS rewards")
    spark.sql("DROP TABLE IF EXISTS transactions")
    spark.sql("DROP TABLE IF EXISTS filters")
  }
}
