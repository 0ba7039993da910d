package graft.functions

import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.helium.SparkSuite

/** [[TopKByScore]] against its executable spec (the window formulation it
  * exists to replace at scale) plus the algebraic properties that make it
  * safe to run distributed: partition-order independence and bounded
  * partial state. */
class TopKByScoreSpec extends SparkSuite {
  import spark.implicits._

  private val K = 4
  private def topkCol = udaf(new TopKByScore(K),
    Encoders.product[TopKByScore.ScoredId])

  /** Random grouped scores with planted TIES (score quantized to one
    * decimal) so the vec_id tie-break is actually exercised. */
  private def fixture(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(800) { i =>
      (rnd.nextInt(7).toLong, math.floor(rnd.nextDouble() * 10) / 10,
        i.toLong, rnd.nextInt(100).toLong)
    }.toDF("grp", "score", "id", "pay")
  }

  test("aggregator equals the row_number window formulation, ties and all") {
    val df = fixture(41)
    val viaAgg = df
      .groupBy(col("grp"))
      .agg(topkCol(col("score"), col("id"), col("pay")).as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("grp"), (col("i") + 1).as("rk"),
        col("e.id").as("id"), col("e.payload").as("pay"))
      .as[(Long, Int, Long, Long)].collect().toSet
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("id").asc)
    val viaWindow = df
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= K)
      .select(col("grp"), col("rk"), col("id"), col("pay"))
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("result is independent of partitioning (merge order)") {
    val base = fixture(42)
    def run(parts: Int) = base.repartition(parts)
      .groupBy(col("grp"))
      .agg(topkCol(col("score"), col("id"), col("pay")).as("top"))
      .select(col("grp"), col("top"))
      .as[(Long, Seq[(Double, Long, Long)])].collect().toMap
    val r1 = run(1)
    assert(run(13) == r1 && run(32) == r1)
  }

  test("partial buffers stay bounded at k and the plan aggregates map-side") {
    // direct unit check of the bound reduce/merge maintain
    val agg = new TopKByScore(3)
    val grown = (0 until 50).foldLeft(agg.zero) { (b, i) =>
      val next = agg.reduce(b, TopKByScore.ScoredId(i.toDouble, i.toLong, 0L))
      assert(next.length <= 3, s"buffer grew to ${next.length}")
      next
    }
    assert(agg.merge(grown, grown).length <= 3)
    assert(grown.map(_.id) == Seq(49L, 48L, 47L))
    // and the physical plan carries a partial (map-side) aggregation
    val p = fixture(43)
      .groupBy(col("grp"))
      .agg(topkCol(col("score"), col("id"), col("pay")).as("top"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_topkbyscore"),
      s"TopKByScore lost its map-side partial:\n$p")
  }
}
