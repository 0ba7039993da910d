package graft.helium

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

import Model._

/** Streaming semantics (SURVEY §5.5): resume-from-cursor after restart,
  * strict height coverage, exactly-once via idempotent batch partitions. */
class FollowerStreamSpec extends SparkSuite {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def copyFixture(dst: String): Unit = {
    val src = fixture("basic")
    Seq("blocks.jsonl", "txns.jsonl").foreach { f =>
      Files.copy(Paths.get(src, f), Paths.get(dst, f))
    }
  }

  test("follower drains fixture stream, commits rewards + cursor; resumes only new blocks") {
    val fixDir = tmpDir("fixt")
    val root = tmpDir("root")
    copyFixture(fixDir)

    // tip-follow from height 99 so blocks 100..105 are pending
    val store = new StateStore(spark, root)
    store.advance(IngestState(99, 100))

    val q1 = Follower.start(spark, fixDir, root, EtlMode.Rewards)
    q1.processAllAvailable()
    q1.stop()

    val rewards1 = spark.read.parquet(s"$root/rewards")
    assert(rewards1.count() == 5)
    assert(store.load().get.height == 105)

    // append block 106 (new tip) + its txn, then restart the follower:
    // only the new block may be processed (resume-from-cursor,
    // src/follower.rs:123-142)
    val src = fixture("basic")
    Files.write(Paths.get(fixDir, "blocks.jsonl"),
      Files.readAllBytes(Paths.get(src, "extra_block.jsonl")),
      StandardOpenOption.APPEND)
    Files.write(Paths.get(fixDir, "txns.jsonl"),
      Files.readAllBytes(Paths.get(src, "extra_txn.jsonl")),
      StandardOpenOption.APPEND)

    val q2 = Follower.start(spark, fixDir, root, EtlMode.Rewards)
    q2.processAllAvailable()
    q2.stop()

    val rewards2 = spark.read.parquet(s"$root/rewards")
    assert(rewards2.count() == 6)
    assert(rewards2.filter(col("block") === 106).count() == 1)
    // earlier batch partitions untouched (no reprocessing of 100..105)
    assert(rewards2.filter(col("block") <= 105).count() == 5)
    assert(store.load().get.height == 106)
  }

  test("idempotent batch overwrite: recommitting a batch does not duplicate") {
    val fixDir = tmpDir("fixt2")
    val root = tmpDir("root2")
    copyFixture(fixDir)
    val node = new FixtureNode(fixDir)
    val sink = new ExactlyOnceSink(spark, root)

    val heights = (100L to 105L).flatMap(node.getBlockJson)
    import spark.implicits._
    val blocks = Follower.parseBlocks(heights.toDF("json"))
    val payloads = Follower.fetchPayloads(spark, node, blocks, EtlMode.Rewards)
    val out = Pipeline.run(EtlMode.Rewards, blocks, payloads)

    sink.commit(out, batchId = 7, maxHeight = 105, firstBlock = 100)
    val once = sink.rewardsTable().count()
    // crash-before-cursor replay: same batch id, same data
    sink.commit(out, batchId = 7, maxHeight = 105, firstBlock = 100)
    assert(sink.rewardsTable().count() == once)
  }

  test("compaction consolidates closed batches, preserves rows, newest batch untouched") {
    val fixDir = tmpDir("fixt3")
    val root = tmpDir("root4")
    copyFixture(fixDir)
    val node = new FixtureNode(fixDir)
    val sink = new ExactlyOnceSink(spark, root)
    import spark.implicits._

    // three batches; the last (blocks 104-105) yields ZERO rewards (r105
    // has an empty rewards list) so it writes no partition at all — the
    // newest *existing* partition is batch 1, and that is what compaction
    // must protect (it is the only one that could still be a replay
    // target after a crash-before-cursor).
    Seq((100L to 101L, 0L), (102L to 103L, 1L), (104L to 105L, 2L))
      .foreach { case (range, id) =>
        val blocks = Follower.parseBlocks(
          range.flatMap(node.getBlockJson).toDF("json"))
        val payloads = Follower.fetchPayloads(spark, node, blocks, Model.EtlMode.Rewards)
        sink.commit(Pipeline.run(Model.EtlMode.Rewards, blocks, payloads),
          id, range.last, 100)
      }
    val before = sink.rewardsTable().count()
    assert(before == 5)

    sink.compact("rewards", targetPartitions = 1)
    val after = sink.rewardsTable()
    assert(after.count() == before)
    // batch 0 consolidated into -1; newest existing batch (1) untouched
    assert(after.select("batch_id").distinct().as[Long].collect().toSet
      == Set(-1L, 1L))
    // compacting again with nothing new closed is a no-op
    sink.compact("rewards")
    assert(sink.rewardsTable().count() == before)
    assert(sink.rewardsTable().select("batch_id").distinct()
      .as[Long].collect().toSet == Set(-1L, 1L))
  }

  test("cursor is monotonic — backwards advance is refused") {
    val root = tmpDir("root3")
    val store = new StateStore(spark, root)
    store.advance(IngestState(50, 10))
    intercept[IllegalArgumentException] {
      store.advance(IngestState(49, 10))
    }
    assert(store.load().get == IngestState(50, 10))
  }
}
