package graft.operators

import org.apache.spark.sql.functions._

import graft.helium.SparkSuite

class ShardWriterSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def tmpDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("shard write is lossless, deterministic, and every shard lands") {
    val docs = graft.Tables.documents(spark, sf)
    val out = tmpDir("shards")
    val receipt = ShardWriter.write(docs, 8, out)
      .as[(Long, Long)].collect().toMap
    // every shard materialized, counts add up to the corpus
    assert(receipt.keySet == (0L until 8L).toSet, s"missing shards: $receipt")
    assert(receipt.values.sum == docs.count())
    // lossless: the same rows come back (shard is the only added column)
    val back = spark.read.parquet(out).drop("shard")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // deterministic: a second write assigns every doc identically
    val out2 = tmpDir("shards2")
    ShardWriter.write(docs, 8, out2)
    val a = spark.read.parquet(out).select("doc_id", "shard")
      .as[(Long, Long)].collect().toMap
    val b = spark.read.parquet(out2).select("doc_id", "shard")
      .as[(Long, Long)].collect().toMap
    assert(a == b, "hash sharding must be reproducible across runs")
  }

  test("d22 audits the SAME assignment the writer materializes, and the " +
    "hash balances token mass") {
    val plan = graft.SparkEntry.queries("d22_shard_plan")(spark, sf)
      .select("shard", "n_docs", "sum_words")
      .as[(Long, Long, Long)].collect()
    assert(plan.map(_._1).sorted.toSeq == (0L until 16L).toSeq)
    // balance: no shard above 2x or below half the mean token mass —
    // LLN at ~31 docs/shard on the deterministic fixture
    val masses = plan.map(_._3)
    val mean = masses.sum / masses.length
    assert(masses.max <= 2 * mean && masses.min * 2 >= mean,
      s"skewed shards: min ${masses.min}, mean $mean, max ${masses.max}")
    // the written layout groups exactly the docs d22 counted per shard
    val out = tmpDir("shards3")
    ShardWriter.write(graft.Tables.documents(spark, sf), 16, out)
    val written = spark.read.parquet(out)
      .groupBy("shard").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    plan.foreach { case (shard, nDocs, _) =>
      assert(written(shard) == nDocs,
        s"shard $shard: audit says $nDocs docs, writer landed ${written(shard)}")
    }
  }

  test("onePassPerShard (param or conf) bounds each shard dir to one " +
    "file, same rows, same assignment") {
    val docs = graft.Tables.documents(spark, sf).repartition(8)
    def filesPerShard(out: String): Map[String, Int] = {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      try st.iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .toSeq.groupBy(_.getParent.getFileName.toString)
        .view.mapValues(_.size).toMap
      finally st.close()
    }
    val plain = tmpDir("sw_plain")
    ShardWriter.writeDocs(docs, 4, plain)
    // 8 input tasks × 4 shards: the stream-through write leaves
    // several files per shard dir (this is WHY the one-pass mode and
    // compactNights exist)
    assert(filesPerShard(plain).values.max > 1,
      "fixture too small to demonstrate the multi-file layout")
    val onePass = tmpDir("sw_onepass")
    spark.conf.set("spark.graft.shards.onePassPerShard", "true")
    try ShardWriter.writeDocs(docs, 4, onePass)
    finally spark.conf.unset("spark.graft.shards.onePassPerShard")
    assert(filesPerShard(onePass).values.max == 1,
      s"one-pass write left multiple files: ${filesPerShard(onePass)}")
    // identical contents and assignment either way
    val a = spark.read.parquet(plain).select("doc_id", "shard")
      .as[(Long, Long)].collect().toMap
    val b = spark.read.parquet(onePass).select("doc_id", "shard")
      .as[(Long, Long)].collect().toMap
    assert(a == b, "the one-pass layout changed the shard assignment")
  }
}
