package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.helium.SparkSuite
import graft.queries.TextDedupOps

/** p01 composition gate: the one-job pipeline must agree with its own
  * stages run independently, and its receipt must describe the parquet
  * shards actually on disk — not the pre-write plan. */
class PipelineComposeSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"
  private def outDir = sys.props("java.io.tmpdir") + "/graft_p01_shards"

  // the d15 split rule, recomputed from the public hash so the spec does
  // not borrow the implementation it is checking
  private def split(c: Column): Column = {
    val bucket = graft.functions.Portable.hash60(c.cast("string"), 777) % 1000L
    when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test")
  }

  test("p01 receipt equals the accounting recomputed from the written shard files") {
    val receipt = TextDedupOps.p01(spark, sf).collect().toSet
    val fromFiles = spark.read.parquet(outDir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("sum_tokens"),
        sum(col("bin")).as("sum_bin"),
        md5(array_join(transform(array_sort(collect_list(col("doc_id"))),
          x => x.cast("string")), ",")).as("ids_md5"))
      .collect().toSet
    assert(receipt.nonEmpty && receipt == fromFiles)
  }

  test("p01 reliable-checkpoint path (spark.graft.checkpointDir) writes " +
    "fs-backed cuts and produces the identical receipt") {
    val base = TextDedupOps.p01(spark, sf).collect().toSet
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", ckpt)
    try {
      val withReliable = TextDedupOps.p01(spark, sf).collect().toSet
      assert(withReliable == base,
        "reliable-checkpoint run changed the receipt")
      // the cut actually went through the fs-backed path
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files written under $ckpt")
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("p01 written corpus equals its stage-by-stage composition") {
    TextDedupOps.p01(spark, sf).collect() // materialize the shards
    val written = spark.read.parquet(outDir).persist()
    val nWritten = written.count()
    assert(nWritten > 0)

    // stages 1+2 rerun standalone: exact-dedup winners, then span dedup
    val w = Window.partitionBy(md5(col("text")))
    val survivors = Tables.documents(spark, sf)
      .withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("source"), col("text"))
    val cleaned = TextDedupOps.spanDedupedDocs(survivors)
      .select(col("doc_id"), col("source"), col("clean_text").as("text"))
      .persist()

    // every written doc is a survivor, carrying exactly the CLEANED text
    val joined = written.select(col("doc_id"), col("text").as("w_text"))
      .join(cleaned.select(col("doc_id"), col("text")), Seq("doc_id"))
    assert(joined.count() == nWritten, "written docs not all survivors")
    assert(joined.filter(col("w_text") =!= col("text")).count() == 0,
      "written text is not the span-cleaned text")

    // stage 3 rerun: no written doc is leaky, all are train split
    val pairs = TextDedupOps.leakagePairsOf(spark, cleaned)
    val sym = pairs.select(col("a_id").as("x"), col("b_id").as("y"))
      .unionByName(pairs.select(col("b_id").as("x"), col("a_id").as("y")))
    val leaky = sym
      .filter(split(col("x")) === "train" && split(col("y")) =!= "train")
      .select(col("x").as("doc_id")).distinct()
    assert(written.join(leaky, Seq("doc_id"), "left_semi").count() == 0,
      "a decontamination-dropped doc reached the shards")
    assert(written.filter(split(col("doc_id")) =!= "train").count() == 0,
      "a non-train doc reached the shards")

    // stage 4 rerun: every written doc clears the per-source p10 floor
    // recomputed over the decontaminated train corpus
    val train = cleaned.filter(split(col("doc_id")) === "train")
      .join(leaky, Seq("doc_id"), "left_anti")
    val scored = TextDedupOps.scoredOf(train)
      .select(col("doc_id"), col("source"), col("score_pm"))
    val thr = scored.groupBy(col("source"))
      .agg(expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY score_pm)")
        .cast("long").as("p10"))
    assert(written.select(col("doc_id"))
      .join(scored, Seq("doc_id"))
      .join(thr, Seq("source"))
      .filter(col("score_pm") < col("p10")).count() == 0,
      "a below-p10 doc reached the shards")

    // stage 5 rerun: bin assignment is the packing window over exactly
    // the kept set (the written docs), in per-source doc_id order
    val wp = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rebinned = written
      .select(col("doc_id"), col("source"), col("n_toks"), col("bin"))
      .withColumn("cum", coalesce(sum(col("n_toks")).over(wp), lit(0L)))
      .filter(col("bin") =!= expr("cum DIV 256"))
    assert(rebinned.count() == 0, "packing bins diverge from the t12 window")

    written.unpersist(); cleaned.unpersist()
  }
}
