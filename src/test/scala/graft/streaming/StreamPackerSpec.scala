package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.helium.SparkSuite
import StreamPacker._

class StreamPackerSpec extends SparkSuite {
  import spark.implicits._

  private val budget = 100L

  test("streaming packing: cursor persists across micro-batches and " +
    "matches the batch rule on the concatenated input") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = pack(input.toDS(), budget).writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("pack_out").start()
    val batch1 = Seq(Doc("s1", 1, 40), Doc("s1", 2, 40), Doc("s2", 1, 90))
    val batch2 = Seq(Doc("s1", 3, 40), Doc("s2", 2, 30), Doc("s1", 4, 10))
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()

      val got = spark.table("pack_out")
        .select("source", "doc_id", "bin", "offset_in_bin")
        .as[(String, Long, Long, Long)].collect().toSet

      // batch-mode reference: the t12 rule over the full concatenated input
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val expect = (batch1 ++ batch2).toDS().toDF()
        .withColumn("cum", coalesce(sum(col("n_toks")).over(w), lit(0L)))
        .select(col("source"), col("doc_id"),
          expr(s"cum DIV $budget").as("bin"),
          expr(s"cum % $budget").as("offset_in_bin"))
        .as[(String, Long, Long, Long)].collect().toSet

      assert(got == expect, s"streaming $got vs batch $expect")
      // and the cursor really crossed the batch boundary: doc s1/3 starts
      // at 80 tokens (40+40 from batch 1), not at 0
      assert(got.contains(("s1", 3L, 0L, 80L)))
      // s1/4 lands after 120 tokens -> bin 1, offset 20
      assert(got.contains(("s1", 4L, 1L, 20L)))
    } finally q.stop()
  }
}
