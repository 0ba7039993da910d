package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("s01_knn_bruteforce")(spark, sf)
      .filter(col("rank") <= 3).select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (q <- Seq("s02_ann_lsh", "s05_ann_ivf")) {
      val got = SparkEntry.queries(q)(spark, sf)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"RECALL $q = ${(got & exact).size.toDouble / exact.size} (${got.size} rows)")
    }
    spark.stop()
  }
}
