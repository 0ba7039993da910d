package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.helium.SparkSuite

/** The bucketed two-pass prefix sum must be BIT-IDENTICAL to the naive
  * per-key ordered window at every bucket count — that is the whole
  * contract that lets t12/p01 swap it in without touching their oracles. */
class PrefixSumSpec extends SparkSuite {
  import spark.implicits._

  /** Skewed fixture: one giant key (the 100 TB failure shape), one tiny
    * key, one singleton, ord ids deliberately sparse/non-contiguous so
    * range buckets land unevenly. */
  private lazy val fixture = {
    val rnd = new scala.util.Random(42)
    val rows =
      (1 to 5000).map(i => ("big", i.toLong * 17 + (i % 13), (rnd.nextInt(50) + 1).toLong)) ++
      (1 to 40).map(i => ("small", i.toLong * 1000003, (rnd.nextInt(50) + 1).toLong)) ++
      Seq(("lone", 7L, 5L))
    rows.toDF("source", "doc_id", "n_toks").repartition(8)
  }

  private def naive = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    fixture
      .withColumn("cum_before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select("source", "doc_id", "cum_before")
      .as[(String, Long, Long)].collect()
      .map { case (s, i, c) => (s, i) -> c }.toMap
  }

  test("bucketed prefix sum equals the ordered window at every bucket count") {
    val expected = naive
    for (b <- Seq(1, 2, 7, 32, 257, 5000)) {
      val got = PrefixSum
        .exclusive(fixture, "source", "doc_id", "n_toks", "cum_before", b)
        .select("source", "doc_id", "cum_before")
        .as[(String, Long, Long)].collect()
        .map { case (s, i, c) => (s, i) -> c }.toMap
      assert(got == expected, s"divergence at buckets=$b")
    }
  }

  test("forced high bucket count drives the production t12/p01 path and " +
    "stays hash-identical to the default") {
    val sf = "/root/testdata/sf0.01"
    def run() = graft.SparkEntry.queries("t12_sequence_packing")(spark, sf)
      .orderBy("source").collect().toSeq
    val dflt = run()
    spark.conf.set("spark.graft.pack.buckets", "311")
    try assert(run() == dflt, "t12 bins changed under buckets=311")
    finally spark.conf.unset("spark.graft.pack.buckets")
  }

  test("schema and column passthrough: only the out column is added") {
    val out = PrefixSum.exclusive(fixture, "source", "doc_id", "n_toks", "c", 8)
    assert(out.columns.toSet == Set("source", "doc_id", "n_toks", "c"))
  }
}
