package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.helium.SparkSuite
import graft.queries.TextDedupOps

/** The corpus root's consumer contract: committed-only reads,
  * compaction with recorded absorption, lazy prune. Nights are written
  * by the real p04Night (against a real index) so the spec pins the
  * producer/consumer pair, not a fixture of the layout. */
class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private def freshText(p: String): String =
    (0 until 40).map(i => s"$p$i").mkString(" ")

  private def docsDf(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, "s" + (id % 2), t) }
      .toDF("doc_id", "source", "text")

  private def night(idx: String, root: String, id: String,
      rows: (Long, String)*): Unit = {
    assert(TextDedupOps.p04Night(spark, idx, docsDf(rows: _*), root, id)
      .isDefined, s"night $id unexpectedly skipped")
    graft.Pinned.releaseAll(spark)
  }

  private def servedIds(root: String): Set[Long] =
    Corpus.readCommitted(spark, root)
      .select("doc_id").as[Long].collect().toSet

  private def walk(dir: String): Seq[(String, Long)] = {
    val s = java.nio.file.Files.walk(Paths.get(dir))
    try s.iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => p.toString -> java.nio.file.Files.size(p))
      .toSeq.sortBy(_._1)
    finally s.close()
  }

  test("readCommitted serves exactly the committed nights — a crashed " +
    "night's partial dir (files, no marker) is invisible") {
    val idx = Files.createTempDirectory("cs_idx").toString
    val root = Files.createTempDirectory("cs_root").toString
    TextDedupOps.d24Build(spark, idx,
      docsDf((0L to 2L).map(i => i -> freshText(s"cb${i}w")): _*))
    night(idx, root, "n1",
      10L -> freshText("cu1w"), 11L -> freshText("cu2w"))

    // fabricate the crash: a night dir with real parquet but no marker
    Seq((99L, "s1", "junk")).toDF("doc_id", "source", "text")
      .write.parquet(s"$root/night=crashed")

    assert(Corpus.liveNights(spark, root) == Seq("n1"))
    assert(servedIds(root) == Set(10L, 11L),
      "a marker-less partial night leaked into the committed read")
    // partition columns ride along for directory pruning
    val cols = Corpus.readCommitted(spark, root).columns.toSet
    assert(cols.contains("night") && cols.contains("shard"))
  }

  test("compactNights rewrites the live set as one recorded merge: " +
    "reads unchanged, absorbed dirs prunable, rerun a frozen no-op, " +
    "chains resolve") {
    val idx = Files.createTempDirectory("cc_idx").toString
    val root = Files.createTempDirectory("cc_root").toString
    TextDedupOps.d24Build(spark, idx, docsDf(0L -> freshText("kb0w")))
    night(idx, root, "n1", 10L -> freshText("ku1w"))
    night(idx, root, "n2", 20L -> freshText("ku2w"))

    assert(Corpus.compactNights(spark, root, "c1"))
    assert(Corpus.liveNights(spark, root) == Seq("c1"))
    assert(servedIds(root) == Set(10L, 20L),
      "compaction changed the served row set")
    // sources still on disk (lazy prune), but excluded from reads
    assert(Files.exists(Paths.get(s"$root/night=n1")))

    // rerun with the same id: recorded no-op, root byte-frozen
    val frozen = walk(root)
    assert(!Corpus.compactNights(spark, root, "c1"))
    assert(walk(root) == frozen, "a skipped compaction touched the root")

    // prune deletes the absorbed dirs, reads unchanged
    assert(Corpus.pruneNights(spark, root).toSet == Set("n1", "n2"))
    assert(!Files.exists(Paths.get(s"$root/night=n1")))
    assert(servedIds(root) == Set(10L, 20L))

    // chain: a fresh night, then a second compaction absorbing c1+n3
    // WITHOUT an intervening prune — the absorbed set resolves the
    // chain and serves only c2
    night(idx, root, "n3", 30L -> freshText("ku3w"))
    assert(Corpus.compactNights(spark, root, "c2"))
    assert(Corpus.liveNights(spark, root) == Seq("c2"))
    assert(servedIds(root) == Set(10L, 20L, 30L))
    assert(Corpus.pruneNights(spark, root).toSet == Set("c1", "n3"))
    assert(servedIds(root) == Set(10L, 20L, 30L))
  }

  test("a run of stream micro-nights compacts to a bounded file " +
    "count — the small-files answer for the always-on corpus ingest") {
    val idx = Files.createTempDirectory("cm_idx").toString
    val root = Files.createTempDirectory("cm_root").toString
    TextDedupOps.d24Build(spark, idx, docsDf(0L -> freshText("mb0w")))
    // 8 micro-batches of 5 fresh docs each, as the stream would land them
    (0 until 8).foreach { b =>
      val docs = docsDf((0 until 5).map(i =>
        (1000L + b * 10 + i) -> freshText(s"mu${b}x${i}y")): _*)
      assert(graft.streaming.StoreDedup.nightBatch(
        spark, idx, root, docs.toDF(), "mn", b.toLong))
    }
    def parquetFiles = walk(root).count(_._1.endsWith(".parquet"))
    val before = parquetFiles
    val served = servedIds(root)
    assert(served.size == 40 && Corpus.liveNights(spark, root).size == 8)

    assert(Corpus.compactNights(spark, root, "base"))
    assert(Corpus.pruneNights(spark, root).size == 8)
    assert(parquetFiles < before,
      s"compaction did not shrink the file count ($before -> " +
        s"$parquetFiles)")
    assert(servedIds(root) == served,
      "compaction changed the served corpus")
  }

  test("an empty root: readCommitted throws without a schema, reads as " +
    "an empty frame with one") {
    val root = Files.createTempDirectory("ce_root").toString
    intercept[IllegalStateException] {
      Corpus.readCommitted(spark, root)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType)))
    assert(Corpus.readCommitted(spark, root, Some(schema)).count() == 0L)
  }
}
