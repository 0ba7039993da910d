package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.helium.SparkSuite

/** Library robustness, part two (EmptyCorpusSpec is part one): every
  * query must RUN on a corpus containing the dirty document rows a real
  * crawl produces — NULL text, NULL lang/n_chars, empty-string text.
  * The text/dedup/ANN surface is null-safe by construction (tokenize of
  * NULL is NULL, filters drop it); the media boundary drops NULL
  * payloads at ingest (a null payload is no media). This spec pins
  * both facts: no query may throw, and the dirty rows must not
  * silently change any clean-row accounting. */
class DirtyCorpusSpec extends SparkSuite {

  private lazy val dirtyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("dirtycorpus").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val dirty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(900001L, null, "en", "src0", 0L),
        org.apache.spark.sql.Row(900002L, null, null, "src1", null),
        org.apache.spark.sql.Row(900003L, "", "en", "src2", 0L))),
      docs.schema)
    docs.unionByName(dirty)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("every query runs on a corpus with null/empty text rows") {
    spark.conf.set("spark.graft.p01.outDir",
      Files.createTempDirectory("p01dirty").toString)
    spark.conf.set("spark.graft.d24.indexDir",
      Files.createTempDirectory("d24dirty").toString)
    spark.conf.set("spark.graft.t23.tokenizerDir",
      Files.createTempDirectory("t23dirty").toString)
    try {
      val failures = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
        val r =
          try { fn(spark, dirtyDir).count(); None }
          catch { case e: Throwable => Some(name -> e.toString.take(200)) }
        Pinned.releaseAll(spark)
        r
      }
      assert(failures.isEmpty,
        s"${failures.size} queries die on a dirty corpus:\n" +
          failures.map { case (n, e) => s"  $n: $e" }.mkString("\n"))
    } finally {
      spark.conf.unset("spark.graft.p01.outDir")
      spark.conf.unset("spark.graft.d24.indexDir")
      spark.conf.unset("spark.graft.t23.tokenizerDir")
    }
  }

  test("the media boundary drops exactly the NULL-payload rows: the " +
    "empty-text row is a legitimate 0-byte record, the null rows vanish") {
    val clean = graft.multimodal.Media.mediaFromDocuments(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .collect().map(_.media_id).toSet
    val dirty = graft.multimodal.Media.mediaFromDocuments(
      spark.read.parquet(s"$dirtyDir/documents.parquet"))
      .collect().map(_.media_id).toSet
    assert(dirty == clean + 900003L,
      s"boundary drop set wrong: extra=${dirty -- clean}, " +
        s"missing=${clean -- dirty}")
  }
}
