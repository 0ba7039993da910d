package graft.operators

import java.nio.file.{Files, Paths}

import graft.helium.SparkSuite

/** The single-writer ENFORCEMENT contract of [[IndexGenerations]] —
  * round 12 documented the contract; this pins the fence that makes a
  * violation an error instead of silent corruption:
  *
  *  1. every mutation (advance / compact / prune / writeTables) takes a
  *     create-exclusive `_WRITER_LEASE` at the root — a second writer
  *     arriving mid-mutation fails cleanly and touches nothing;
  *  2. a crashed writer's stale lease is taken over after the
  *     `spark.graft.index.leaseTimeoutMs` bound;
  *  3. the lost-race backstop: a writer that computed its target
  *     generation from a stale listing (the race where both writers
  *     read `currentGen=N` before either committed) refuses to
  *     overwrite the winner's COMMITTED `gen=N+1`.
  *
  * Also pins the record lifecycle under compaction: commit records
  * (the exactly-once replay evidence of `advanceByConfRecorded`) ride
  * into compacted totals and rewrite advances as merged line sets, so
  * a prune can never erase them. */
class WriterFenceSpec extends SparkSuite {
  import spark.implicits._

  private def seed(root: String): Unit =
    IndexGenerations.reset(spark, root, Seq(0L -> "seed").toDF("id", "v"))

  private def contents(root: String): Set[(Long, String)] =
    IndexGenerations.readCurrent(spark, root)
      .as[(Long, String)].collect().toSet

  test("a held lease makes every mutation fail cleanly and leave the " +
    "store untouched; release unblocks") {
    val root = Files.createTempDirectory("fence").toString
    seed(root)
    val lease = Paths.get(root, "_WRITER_LEASE")
    Files.write(lease, System.currentTimeMillis().toString.getBytes)
    val e = intercept[IllegalStateException] {
      IndexGenerations.advance(spark, root, Seq(1L -> "x").toDF("id", "v"))
    }
    assert(e.getMessage.contains("lease"), e.getMessage)
    intercept[IllegalStateException] {
      IndexGenerations.advanceDelta(spark, root,
        Seq(1L -> "x").toDF("id", "v"))
    }
    intercept[IllegalStateException] { IndexGenerations.compact(spark, root) }
    intercept[IllegalStateException] { IndexGenerations.prune(spark, root) }
    assert(contents(root) == Set(0L -> "seed"),
      "a fenced-out writer modified the store")
    assert(IndexGenerations.committed(spark, root) == Seq(0L))
    // the holder's lease survives the failed attempts (a loser must
    // not release a lease it never held)…
    assert(Files.exists(lease), "a fenced-out writer deleted the lease")
    // …and an orderly release unblocks the next writer
    Files.delete(lease)
    IndexGenerations.advance(spark, root, Seq(1L -> "x").toDF("id", "v"))
    assert(contents(root) == Set(0L -> "seed", 1L -> "x"))
    assert(!Files.exists(lease), "a completed write must release")
  }

  test("a stale lease (crashed writer) is taken over after the " +
    "configured bound") {
    val root = Files.createTempDirectory("fence_stale").toString
    seed(root)
    spark.conf.set("spark.graft.index.leaseTimeoutMs", "50")
    try {
      Files.write(Paths.get(root, "_WRITER_LEASE"),
        (System.currentTimeMillis() - 10000L).toString.getBytes)
      IndexGenerations.advance(spark, root, Seq(2L -> "y").toDF("id", "v"))
      assert(contents(root) == Set(0L -> "seed", 2L -> "y"))
      assert(!Files.exists(Paths.get(root, "_WRITER_LEASE")))
    } finally spark.conf.unset("spark.graft.index.leaseTimeoutMs")
  }

  test("lease takeover is content-verified: a fresh tokened foreign " +
    "lease fences cleanly and survives, a stale legacy bare-stamp " +
    "lease is taken over, and status parses both formats") {
    val root = Files.createTempDirectory("fence_token").toString
    seed(root)
    val lease = Paths.get(root, "_WRITER_LEASE")
    spark.conf.set("spark.graft.index.leaseTimeoutMs", "50")
    try {
      // legacy bare-stamp lease (pre-token stores), stale: taken over
      Files.write(lease,
        (System.currentTimeMillis() - 10000L).toString.getBytes)
      IndexGenerations.advance(spark, root, Seq(1L -> "x").toDF("id", "v"))
      assert(!Files.exists(lease), "takeover must release on exit")
      // fresh tokened foreign lease: fenced out, content untouched —
      // the compare-and-delete must never fall on a fresh lease.
      // (restore the real staleness bound first — under the 50ms test
      // bound ANY lease is stale by the time the writer reads it)
      spark.conf.unset("spark.graft.index.leaseTimeoutMs")
      val stamp = System.currentTimeMillis()
      val foreign = stamp.toString + ":foreign-uuid"
      Files.write(lease, foreign.getBytes)
      intercept[IllegalStateException] {
        IndexGenerations.advance(spark, root,
          Seq(2L -> "y").toDF("id", "v"))
      }
      assert(Files.exists(lease) &&
        new String(Files.readAllBytes(lease), "UTF-8") == foreign,
        "a fenced-out writer touched the holder's tokened lease")
      // status reads the stamp out of the tokened format
      assert(IndexGenerations.leaseStamp(spark, root).contains(stamp))
      Files.delete(lease)
    } finally spark.conf.unset("spark.graft.index.leaseTimeoutMs")
  }

  test("a holder whose lease was usurped mid-body exits WITHOUT " +
    "deleting the usurper's lease") {
    val root = Files.createTempDirectory("fence_usurp").toString
    val lease = Paths.get(root, "_WRITER_LEASE")
    val usurper = System.currentTimeMillis().toString + ":usurper-uuid"
    IndexGenerations.withLease(spark, root) {
      // simulate a legitimate timeout takeover while the body runs
      Files.write(lease, usurper.getBytes)
      42
    }
    assert(Files.exists(lease) &&
      new String(Files.readAllBytes(lease), "UTF-8") == usurper,
      "the usurped holder deleted the usurper's lease on exit")
    Files.delete(lease)
  }

  test("lost-race backstop: a write targeting an ALREADY-COMMITTED " +
    "generation errors instead of overwriting the winner") {
    val root = Files.createTempDirectory("fence_race").toString
    seed(root)
    // writer A wins: commits gen=1
    IndexGenerations.advance(spark, root, Seq(1L -> "A").toDF("id", "v"))
    // writer B raced: it listed the root while gen=0 was newest, so its
    // computed target is gen=1 too — the write must refuse
    val e = intercept[IllegalStateException] {
      IndexGenerations.write(spark, root, 1L,
        Seq(9L -> "B").toDF("id", "v"))
    }
    assert(e.getMessage.contains("already committed"), e.getMessage)
    assert(contents(root) == Set(0L -> "seed", 1L -> "A"),
      "the loser overwrote the winner's committed generation")
  }

  test("commit records survive compact + prune as merged line sets, on " +
    "both advance modes") {
    val root = Files.createTempDirectory("fence_rec").toString
    seed(root)
    // two recorded LSM folds, then the level-0 merge and a prune.
    // "stream_batch" here is a MEMBERSHIP ledger (no _hwm suffix): the
    // full value history must ride into the compacted total
    spark.conf.set("spark.graft.index.advanceMode", "delta")
    try {
      IndexGenerations.advanceByConfRecorded(spark, root,
        Seq(1L -> "a").toDF("id", "v"), Some("stream_batch" -> "ck:0"))
      IndexGenerations.advanceByConfRecorded(spark, root,
        Seq(2L -> "b").toDF("id", "v"), Some("stream_batch" -> "ck:1"))
      IndexGenerations.compact(spark, root)
      IndexGenerations.prune(spark, root)
      assert(IndexGenerations.committed(spark, root).size == 1,
        "prune should leave only the compacted total")
      assert(IndexGenerations.records(spark, root, "stream_batch").toSet ==
        Set("ck:0", "ck:1"),
        "compact dropped the replay evidence of the pruned deltas")
    } finally spark.conf.unset("spark.graft.index.advanceMode")
    // a rewrite advance replaces the chain it read, so it must carry
    // the records of everything it supersedes
    IndexGenerations.advanceByConfRecorded(spark, root,
      Seq(3L -> "c").toDF("id", "v"), Some("night" -> "n7"))
    IndexGenerations.advanceByConfRecorded(spark, root,
      Seq(4L -> "d").toDF("id", "v"), Some("night" -> "n8"))
    IndexGenerations.prune(spark, root)
    assert(IndexGenerations.committed(spark, root).size == 1)
    assert(IndexGenerations.records(spark, root, "stream_batch").toSet ==
      Set("ck:0", "ck:1"), "rewrite advance dropped older records")
    assert(IndexGenerations.records(spark, root, "night").toSet ==
      Set("n7", "n8"))
    assert(contents(root) == Set(0L -> "seed", 1L -> "a", 2L -> "b",
      3L -> "c", 4L -> "d"))
  }

  test("_hwm ledgers compact to the max number per key on every carry " +
    "— the always-on fold's O(#streams) bound — while replay skips " +
    "still hold and malformed lines survive as membership") {
    val root = Files.createTempDirectory("fence_hwm").toString
    seed(root)
    // three recorded LSM folds from stream ckA, one from ckB, plus a
    // line with no numeric tail (malformed — must never be dropped)
    spark.conf.set("spark.graft.index.advanceMode", "delta")
    try {
      Seq("ckA:0", "ckA:1", "ckB:0", "not-a-hwm-line", "ckA:2")
        .zipWithIndex.foreach { case (rec, i) =>
          IndexGenerations.advanceByConfRecorded(spark, root,
            Seq((10L + i) -> s"r$i").toDF("id", "v"),
            Some("fold_hwm" -> rec))
        }
      IndexGenerations.compact(spark, root)
      IndexGenerations.prune(spark, root)
      assert(IndexGenerations.committed(spark, root).size == 1)
      // the compacted total's ledger holds ONE line per stream (the
      // max), not the five-line history — plus the malformed line
      assert(IndexGenerations.records(spark, root, "fold_hwm").toSet ==
        Set("ckA:2", "ckB:0", "not-a-hwm-line"))
      // a second compact round keeps it stable (idempotent compaction)
      IndexGenerations.advanceByConfRecorded(spark, root,
        Seq(20L -> "r5").toDF("id", "v"), Some("fold_hwm" -> "ckA:3"))
      IndexGenerations.compact(spark, root)
      IndexGenerations.prune(spark, root)
      assert(IndexGenerations.records(spark, root, "fold_hwm").toSet ==
        Set("ckA:3", "ckB:0", "not-a-hwm-line"))
    } finally spark.conf.unset("spark.graft.index.advanceMode")
    // the monotonic skip every _hwm consumer applies still answers
    // "seen" for every superseded batch id
    val done = IndexGenerations.records(spark, root, "fold_hwm")
      .collect { case r if r.startsWith("ckA:") =>
        r.stripPrefix("ckA:").toLong }
    assert(done.nonEmpty && done.max >= 2L,
      "hwm compaction erased the replay evidence of an old batch")
  }
}
