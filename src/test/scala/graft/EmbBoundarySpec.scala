package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.helium.SparkSuite

/** Library robustness, part three (empty corpus, dirty text, now dirty
  * VECTORS): the similarity surface must run on an embeddings table
  * carrying the malformed rows real upstream encoders emit — a NULL
  * vector, a ragged zero-norm vector, an empty vector with a NULL
  * label. The one guard is in [[graft.functions.VectorFns.cosineQ]]:
  * no direction ⇒ NULL cosine ⇒ every threshold and rank drops the row
  * naturally. This spec pins that no query throws AND that the dirty
  * rows change nothing for the clean vectors. */
class EmbBoundarySpec extends SparkSuite {
  import spark.implicits._

  private lazy val dirtyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("dirtyemb").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dirty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(900001L, null, 3),
        Row(900002L, Seq(0.0f, 0.0f), 4),
        Row(900003L, Seq.empty[Float], null))),
      emb.schema)
    emb.unionByName(dirty)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("every similarity query runs on an embeddings table with " +
    "null/zero-norm/empty vectors") {
    val failures = SparkEntry.queries.toSeq
      .filter(_._1.startsWith("s"))
      .flatMap { case (name, fn) =>
        val r =
          try { fn(spark, dirtyDir).count(); None }
          catch { case e: Throwable => Some(name -> e.toString.take(200)) }
        Pinned.releaseAll(spark)
        r
      }
    assert(failures.isEmpty,
      s"${failures.size} queries die on dirty embeddings:\n" +
        failures.map { case (n, e) => s"  $n: $e" }.mkString("\n"))
  }

  test("directionless vectors are invisible to the exact top-k: s01 on " +
    "the dirty table equals s01 on the clean one") {
    val clean = SparkEntry.queries("s01_knn_bruteforce")(
      spark, "/root/testdata/sf0.001")
      .select("query_id", "cand_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val dirty = SparkEntry.queries("s01_knn_bruteforce")(spark, dirtyDir)
      .select("query_id", "cand_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    Pinned.releaseAll(spark)
    assert(dirty == clean,
      s"dirty rows leaked into the ranking: extra=${dirty -- clean}, " +
        s"missing=${clean -- dirty}")
    // and the screen that reports them still sees them
    val screen = SparkEntry.queries("s09_embedding_quality")(spark, dirtyDir)
      .select("label", "n_zero_norm").as[(Option[Long], Long)].collect()
    Pinned.releaseAll(spark)
    assert(screen.map(_._2).sum >= 2L,
      s"s09 stopped counting zero-norm vectors: ${screen.toSeq}")
  }
}
