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

  /** The scaladoc's sizing-rule fixture: 90% of rows clustered into 1%
    * of the ord range (ids 0..9000 dense) plus a 10% tail stretched to
    * 100× that range — the shape that degrades fixed-width buckets. */
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    val rows =
      (0 until 9000).map(i => ("c", i.toLong, (rnd.nextInt(20) + 1).toLong)) ++
      (1 to 1000).map(i => ("c", 9000L + i.toLong * 891L,
        (rnd.nextInt(20) + 1).toLong))
    rows.toDF("source", "doc_id", "n_toks").repartition(8)
  }

  /** Re-derive the operator's bucket id with its own formula (lo/width
    * over [min, max]) — occupancy measured from outside, no
    * instrumentation. */
  private def occupancy(b: Int): Map[Long, Long] = {
    val ords = clustered.select("doc_id").as[Long].collect()
    val (lo, hi) = (ords.min, ords.max)
    val w = (hi - lo) / b + 1
    ords.groupBy(o => (o - lo) / w).view.mapValues(_.length.toLong).toMap
  }

  test("clustered ord (90% of rows in 1% of the range): result stays " +
    "exact, and the documented sizing rule restores bucket balance") {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = clustered
      .withColumn("cum", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select("source", "doc_id", "cum")
      .as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    for (b <- Seq(32, 3200)) {
      val got = PrefixSum
        .exclusive(clustered, "source", "doc_id", "n_toks", "cum", b)
        .select("source", "doc_id", "cum")
        .as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
      assert(got == expected, s"divergence at buckets=$b")
    }
    // the degradation is real at the default: the dense cluster spans
    // ~1% of the range, so at 32 buckets it collapses into one
    val at32 = occupancy(32)
    assert(at32.values.max >= 9000L,
      s"expected the cluster in one bucket at b=32, got $at32")
    // sizing rule: T/W = 100, C/R with R = 500 rows/bucket -> 18 -> need
    // buckets >= 1800; 3200 over-provisions and caps every bucket
    val at3200 = occupancy(3200)
    assert(at3200.values.max <= 500L,
      s"sizing rule failed: max bucket ${at3200.values.max} rows at b=3200")
    info(s"occupancy: b=32 max ${at32.values.max} rows in one bucket; " +
      s"b=3200 max ${at3200.values.max} across ${at3200.size} buckets")
  }

  test("schema and column passthrough: only the out column is added") {
    val out = PrefixSum.exclusive(fixture, "source", "doc_id", "n_toks", "c", 8)
    assert(out.columns.toSet == Set("source", "doc_id", "n_toks", "c"))
  }
}
