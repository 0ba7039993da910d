package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.helium.SparkSuite
import graft.queries.TextDedupOps

/** Library-composition contract for the corpus pipelines: a caller
  * running the build (p01) and the report card (p02) in one session
  * must pay ONE documents scan — [[TextDedupOps.buildAndReport]] pins
  * the tokenized base once and both consumers read the cache. */
class PipelineComposeSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("buildAndReport: receipt and report equal the standalone queries, " +
    "and the report plan reads the cache — no second documents scan") {
    val standaloneOut = Files.createTempDirectory("p01solo").toString
    spark.conf.set("spark.graft.p01.outDir", standaloneOut)
    val soloReceipt = SparkEntry.queries("p01_corpus_pipeline")(spark, sf)
      .orderBy("shard").collect().toSeq
    val soloReport = SparkEntry.queries("p02_corpus_report")(spark, sf)
      .orderBy("source").collect().toSeq
    Pinned.releaseAll(spark)

    val composedOut = Files.createTempDirectory("p01comp").toString
    spark.conf.set("spark.graft.p01.outDir", composedOut)
    try {
      val (receipt, report) = TextDedupOps.buildAndReport(spark, sf)
      // tree-level check, not string match: the printed plan embeds the
      // CACHED relation's own file scan inside every InMemoryRelation
      // block (exactly the scan that does NOT re-run), and AQE's
      // wrapper node hides the physical tree from collect — so inspect
      // the optimized logical plan
      val lp = report.queryExecution.optimizedPlan
      val memScans = lp.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
      }
      assert(memScans.nonEmpty,
        s"report does not read the shared cached base:\n$lp")
      val docScans = lp.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.toString.contains("documents") => l
      }
      assert(docScans.isEmpty,
        s"composed report still scans the corpus parquet:\n$lp")
      assert(report.orderBy("source").collect().toSeq == soloReport,
        "composed report diverges from standalone p02")
      assert(receipt.orderBy("shard").collect().toSeq == soloReceipt,
        "composed receipt diverges from standalone p01")
    } finally {
      Pinned.releaseAll(spark)
      spark.conf.unset("spark.graft.p01.outDir")
    }
  }
}
