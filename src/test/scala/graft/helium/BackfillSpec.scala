package graft.helium

import org.scalatest.funsuite.AnyFunSuite

/** S6 — epoch-skipping backfill bootstrap (src/follower.rs:144-194),
  * against a scriptable mock node. No Spark needed: this is driver-side
  * logic by design (SURVEY §7 hard-parts). */
class BackfillSpec extends AnyFunSuite {

  /** Mock node: blocks present in [oldest, tip]; `flakyAt` heights fail
    * once then succeed (transient RPC error — the case the reference's
    * last-epoch recovery path actually handles). */
  private class MockNode(tip: Long, oldest: Long,
      rewardBlocks: Map[Long, Long], // height -> start_epoch
      flakyAt: Set[Long] = Set.empty) extends NodeClient {
    var failed = scala.collection.mutable.Set.empty[Long]
    var fetches = 0
    override def height(): Long = tip
    override def getBlockJson(h: Long): Option[String] = {
      fetches += 1
      if (flakyAt.contains(h) && !failed.contains(h)) { failed += h; return None }
      if (h < oldest || h > tip) return None
      val txns = rewardBlocks.get(h)
        .map(_ => s"""{"hash":"r$h","type":"rewards_v2"}""")
        .getOrElse("")
      Some(s"""{"height":$h,"time":0,"hash":"bh$h","transactions":[$txns]}""")
    }
    override def getTxnJson(hash: String): Option[String] = {
      val h = hash.stripPrefix("r").toLong
      rewardBlocks.get(h).map(se =>
        s"""{"hash":"$hash","type":"rewards_v2","fields":"{\\"start_epoch\\": $se}"}""")
    }
  }

  test("epoch jumps reach the oldest block in O(#epochs)") {
    // After a jump the next fetch is start_epoch - 1 (src/follower.rs:176
    // then the height -= 1 step), so each reward block's start_epoch points
    // one above the previous reward block: 31-block epochs, rewards at
    // 1000, 969, 938, ... 194; plain blocks 193..150 below.
    val rewardBlocks = (0 to 26)
      .map(i => (1000L - 31 * i) -> (1000L - 31 * i - 30)).toMap
    val node = new MockNode(tip = 1000, oldest = 150, rewardBlocks = rewardBlocks,
      flakyAt = Set(162)) // transient failure -> last-epoch recovery path
    val first = Backfill.firstBlock(node)
    assert(first == 150)
    // O(#epochs): far fewer fetches than the 850-block span
    assert(node.fetches < 100, s"fetches=${node.fetches} not epoch-skipping")
  }

  test("shutdown abort returns the last safe height") {
    val node = new MockNode(tip = 500, oldest = 0, rewardBlocks = Map.empty)
    var calls = 0
    val first = Backfill.firstBlock(node, shutdown = () => { calls += 1; calls > 3 })
    assert(first >= 496 && first <= 500)
  }

  test("failed rewards txn fetch aborts the scan at the last safe height (reference Err arm)") {
    // follower.rs:179-183 — a degraded node that serves blocks but fails
    // the rewards payload fetch must stop the walk, not silently keep
    // scanning block-by-block past the failure.
    val rewardBlocks = Map(500L -> 471L, 470L -> 440L)
    val node = new MockNode(tip = 500, oldest = 0, rewardBlocks = rewardBlocks) {
      override def getTxnJson(hash: String): Option[String] =
        if (hash == "r470") None else super.getTxnJson(hash)
    }
    // walk: 500 jumps to 471, steps to 470; 470's txn fetch fails ->
    // abort with lastSafe = 471 (the post-jump height)
    assert(Backfill.firstBlock(node) == 471L)
  }

  test("permanently missing block after first failure throws (reference panic parity)") {
    val node = new MockNode(tip = 300, oldest = 200, rewardBlocks = Map.empty)
    intercept[IllegalStateException] { Backfill.firstBlock(node) }
  }
}
