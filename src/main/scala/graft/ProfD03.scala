package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns._
object ProfD03 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $tag%-12s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val sh = docs.withColumn("ss", shingles(col("text"), 3)).filter(size(col("ss")) > 0)
    time("warm")(docs.count())
    time("shingles")(sh.select(sum(size(col("ss")))).head().getLong(0))
    val hb = sh.withColumn("hb", hash60Array(col("ss"), 0))
    time("hash")(hb.select(sum(size(col("hb")))).head().getLong(0))
    val sig = hb.withColumn("sig", minhashFromHashes(col("hb"), 12))
    time("sig")(sig.select(sum(size(col("sig")))).head().getLong(0))
    val banded = sig.select(col("doc_id"), col("ss"),
      explode(array((0 until 4).map(b => bandKey(col("sig"), b, 3)): _*)).as("band_key"))
    time("banded")(banded.count())
    val a = banded.select(col("doc_id").as("a_id"), col("ss").as("a_ss"), col("band_key"))
    val b = banded.select(col("doc_id").as("b_id"), col("ss").as("b_ss"), col("band_key"))
    val cand = a.join(b, Seq("band_key")).filter(col("a_id") < col("b_id"))
      .select("a_id","b_id","a_ss","b_ss").dropDuplicates("a_id","b_id")
    time("cand")(cand.count())
    spark.stop()
  }
}
