package graft.helium

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Model._

/** End-to-end batch parity over the committed fixtures (FIXTURES.md §A):
  * all three modes of src/block_processor.rs compared against hand-computed
  * golden outputs. */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private def loadFixture(dir: String): (DataFrame, DataFrame) = {
    val node = new FixtureNode(dir)
    val heights = (0L to node.height()).flatMap(h => node.getBlockJson(h))
    val blocks = Follower.parseBlocks(
      heights.toDF("json").withColumn("height", lit(0L)))
    val txnJson = spark.read.text(s"$dir/txns.jsonl")
      .select(from_json(col("value"), txnSchema).as("t")).select("t.*")
    (blocks, txnJson)
  }

  private lazy val (blocks, payloads) = loadFixture(fixture("basic"))

  test("rewards mode: 5 rewards with sentinel + context") {
    val out = Pipeline.run(EtlMode.Rewards, blocks, payloads)
    val rows = out.rewards
      .select("block", "transaction_hash", "time", "account", "gateway", "amount", "type")
      .as[(Long, String, Long, String, String, Long, String)]
      .collect().toSet
    assert(rows == Set(
      (100L, "r100", 1600000100L, "acct1", "gw1", 100L, "poc_challengees"),
      (100L, "r100", 1600000100L, "acct2", NullSentinel, 50L, "securities"),
      (100L, "r100", 1600000100L, NullSentinel, "gw2", 25L, "overages"),
      (102L, "r102", 1600000220L, "acct1", "gw2", 10L, "poc_witnesses"),
      (102L, "r102", 1600000220L, "acct3", "gw3", 30L, "poc_challengees")))
    assert(out.transactions.isEmpty)
  }

  test("filters mode: OR-match once-only, pre-sentinel semantics") {
    val lists = Allowlists(accounts = Set("acct1"), gateways = Set("gw2"))
    val out = Pipeline.run(EtlMode.Filters, blocks, payloads, lists)
    val rows = out.rewards.select("transaction_hash", "account", "gateway")
      .as[(String, String, String)].collect()
    // r100#1 account-hit, r100#3 gateway-hit (account null pre-sentinel),
    // r102#1 double-hit loads exactly once
    assert(rows.length == 3)
    assert(rows.count(r => r._1 == "r102") == 1)
    assert(rows.contains(("r100", NullSentinel, "gw2")))
  }

  test("full mode: envelopes for every txn, jsonb fidelity via parsed equality") {
    val out = Pipeline.run(EtlMode.Full, blocks, payloads)
    val txns = out.transactions.get
    assert(txns.count() == 7)
    assert(txns.select("type").distinct().as[String].collect().toSet
      .subsetOf(transactionTypes.toSet))
    // fields survives as parseable JSON equal to the fixture payload
    // (parsed-JSON equality, not string equality — SURVEY §7 risks)
    val p1 = txns.filter(col("hash") === "p1")
      .select(get_json_object(col("fields"), "$.payer"),
        get_json_object(col("fields"), "$.amount"))
      .as[(String, String)].head()
    assert(p1 == (("acctA", "10")))
    // rewards also loaded in full mode
    assert(out.rewards.count() == 5)
  }

  test("full mode aborts on unknown txn type (enum-cast parity)") {
    val (badBlocks, badPayloads) = loadFixture(fixture("badtype"))
    val out = Pipeline.run(EtlMode.Full, badBlocks, badPayloads)
    val ex = intercept[Exception] { out.transactions.get.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("bogus_v1")))
  }

  test("empty rewards list yields no rows but does not fail (r105)") {
    val out = Pipeline.run(EtlMode.Rewards, blocks, payloads)
    assert(out.rewards.filter(col("transaction_hash") === "r105").count() == 0)
  }
}
