package graft

import java.nio.file.Files

import graft.helium.SparkSuite

/** Library robustness: EVERY declared query must run (possibly to an
  * empty or all-null result) on a corpus whose tables are schema-correct
  * but 0-row — the "new deployment, nothing ingested yet" state. A
  * `.head()` on an empty frame, a `require(nonEmpty)`, an unguarded
  * division, or a trainer that assumes a non-empty vocabulary all
  * surface here as exceptions, not as a production page at 3am. */
class EmptyCorpusSpec extends SparkSuite {

  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("emptycorpus").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query runs on a schema-correct 0-row corpus") {
    // artifact-writing queries need their own scratch dirs
    spark.conf.set("spark.graft.p01.outDir",
      Files.createTempDirectory("p01empty").toString)
    spark.conf.set("spark.graft.d24.indexDir",
      Files.createTempDirectory("d24empty").toString)
    spark.conf.set("spark.graft.t23.tokenizerDir",
      Files.createTempDirectory("t23empty").toString)
    try {
      val failures = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
        val r =
          try { fn(spark, emptyDir).count(); None }
          catch { case e: Throwable => Some(name -> e.toString.take(200)) }
        Pinned.releaseAll(spark)
        r
      }
      assert(failures.isEmpty,
        s"${failures.size} queries die on an empty corpus:\n" +
          failures.map { case (n, e) => s"  $n: $e" }.mkString("\n"))
    } finally {
      spark.conf.unset("spark.graft.p01.outDir")
      spark.conf.unset("spark.graft.d24.indexDir")
      spark.conf.unset("spark.graft.t23.tokenizerDir")
    }
  }
}
