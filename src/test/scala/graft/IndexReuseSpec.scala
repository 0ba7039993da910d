package graft

import java.nio.file.{Files, Paths}

import graft.helium.SparkSuite

/** The nightly-serving contract for the delta-dedup indexes: with
  * `…buildIndex=false`, d24/m12 consume a pre-built artifact VERBATIM —
  * identical verdicts, and the index files untouched on disk (no
  * rebuild, so the base partition is never rescanned or re-decoded). */
class IndexReuseSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  // recursive: the index root is a generation store (gen=N subdirs) —
  // serve mode must leave every generation's files untouched
  private def fileState(dir: String): Map[String, (Long, Long)] = {
    val d = Paths.get(dir)
    import scala.jdk.CollectionConverters._
    Files.walk(d).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .map(p => d.relativize(p).toString ->
        ((Files.size(p), Files.getLastModifiedTime(p).toMillis)))
      .toMap
  }

  private def roundTrip(q: String, dirConf: String, buildConf: String)
      : Unit = {
    val idx = Files.createTempDirectory("reuse").toString
    spark.conf.set(dirConf, idx)
    try {
      val built = SparkEntry.queries(q)(spark, sf)
        .orderBy("verdict", "winner").collect().toSeq
      Pinned.releaseAll(spark)
      val frozen = fileState(idx)
      assert(frozen.nonEmpty, s"$q wrote no index files")
      spark.conf.set(buildConf, "false")
      val served = SparkEntry.queries(q)(spark, sf)
        .orderBy("verdict", "winner").collect().toSeq
      Pinned.releaseAll(spark)
      assert(served == built,
        s"$q serve-mode verdicts diverge from build-mode")
      assert(fileState(idx) == frozen,
        s"$q serve mode rewrote the index")
    } finally {
      spark.conf.unset(dirConf)
      spark.conf.unset(buildConf)
    }
  }

  test("d24 buildIndex=false serves frozen-artifact verdicts without " +
    "touching the index files") {
    roundTrip("d24_delta_dedup",
      "spark.graft.d24.indexDir", "spark.graft.d24.buildIndex")
  }

  test("m12 buildIndex=false serves frozen-artifact verdicts without " +
    "touching the index files (base media never re-decoded)") {
    roundTrip("m12_media_delta",
      "spark.graft.m12.indexDir", "spark.graft.m12.buildIndex")
  }
}
