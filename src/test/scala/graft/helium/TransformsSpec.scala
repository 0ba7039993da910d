package graft.helium

import org.apache.spark.SparkException
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import Model._
import Transforms._

class TransformsSpec extends SparkSuite {
  import spark.implicits._

  private val rewardRows = Seq(
    // (block, transaction_hash, time, account, gateway, amount, type)
    (100L, "r1", 1L, Some("acct1"), Some("gw1"), 100L, "poc_challengees"),
    (100L, "r1", 1L, Some("acct2"), None: Option[String], 50L, "securities"),
    (100L, "r1", 1L, None: Option[String], Some("gw2"), 25L, "overages"),
    (102L, "r2", 2L, Some("acct1"), Some("gw2"), 10L, "poc_witnesses"))
    .toDF("block", "transaction_hash", "time", "account", "gateway", "amount", "type")

  test("T4 sentinelNulls maps absent account/gateway to 1Wh4bh") {
    val out = sentinelNulls(rewardRows)
      .select("account", "gateway").as[(String, String)].collect().toSet
    assert(out.contains(("acct2", NullSentinel))) // securities: no gateway
    assert(out.contains((NullSentinel, "gw2")))   // overages: no account
    assert(!out.exists(p => p._1 == null || p._2 == null))
  }

  test("T6 allowlist: OR across keys, null keys never match, once-only") {
    val lists = Allowlists(accounts = Set("acct1"), gateways = Set("gw2"))
    val out = allowlistFilter(lists)(rewardRows).collect()
    // acct1/gw1 (account hit), null/gw2 (gateway hit), acct1/gw2 (both -> once)
    assert(out.length == 3)
    assert(out.count(r => r.getString(3) == "acct1" && r.getString(4) == "gw2") == 1)
  }

  test("T6 empty allowlists match nothing") {
    val lists = Allowlists(Set.empty, Set.empty)
    assert(allowlistFilter(lists)(rewardRows).count() == 0)
  }

  test("T6 filters-mode output is a subset of rewards-mode output") {
    val lists = Allowlists(Set("acct1"), Set("gw2"))
    val all = rewardRows.collect().toSet
    val filtered = allowlistFilter(lists)(rewardRows).collect().toSet
    assert(filtered.subsetOf(all))
  }

  test("T1 dispatch keeps only rewards_v2 stubs") {
    val stubs = Seq(("h1", "rewards_v2"), ("h2", "payment_v1"), ("h3", "rewards_v2"))
      .toDF("hash", "type")
    assert(dispatchRewards(stubs).select("hash").as[String].collect().toSet
      == Set("h1", "h3"))
  }

  test("T2/T3 flatten preserves reward count and amount sum with context") {
    val enriched = Seq(
      (100L, 1600L, "bh", "r1", "rewards_v2",
        """{"start_epoch":95,"end_epoch":100,"rewards":[
          |{"account":"a","gateway":"g","amount":7,"type":"t"},
          |{"account":"b","gateway":null,"amount":9,"type":"t"}]}""".stripMargin))
      .toDF("block", "time", "block_hash", "hash", "type", "fields")
    val flat = flattenRewards(parseRewardsPayload(enriched))
    assert(flat.count() == 2)
    assert(flat.agg(org.apache.spark.sql.functions.sum("amount"))
      .head().getLong(0) == 16L)
    assert(flat.select("block", "transaction_hash", "time").distinct().head()
      == Row(100L, "r1", 1600L))
  }

  test("T9 strict payload parse aborts on malformed rewards txn") {
    val enriched = Seq(
      (100L, 1600L, "bh", "rbad", "rewards_v2", "not json at all"))
      .toDF("block", "time", "block_hash", "hash", "type", "fields")
    val ex = intercept[Exception] {
      flattenRewards(strictRewardsPayload(enriched)).collect()
    }
    assert(ex.getMessage.contains("rbad")
      || ex.getCause != null && ex.getCause.getMessage.contains("rbad"))
  }

  test("T5 checked narrowing: arithmetic overflow raises under ANSI " +
    "(reference i64::try_from().unwrap() parity, src/reward.rs:35-36)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true") // Spark 4 default
    val big = Seq(Long.MaxValue, Long.MaxValue).toDF("amount")
    val ex = intercept[Exception] {
      big.agg(org.apache.spark.sql.functions.sum(
        $"amount" * 2)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m =>
      m.contains("ARITHMETIC_OVERFLOW") || m.contains("overflow")))
    // a JSON amount beyond Long range nulls out rather than silently
    // wrapping (parse-level narrowing)
    val parsed = Seq("""{"amount": 99999999999999999999999}""").toDF("fields")
      .select(org.apache.spark.sql.functions.from_json(
        $"fields", Model.rewardsV2Schema.add("amount",
          org.apache.spark.sql.types.LongType)).as("p"))
      .select("p.amount")
    assert(parsed.head().isNullAt(0))
  }

  test("K2 enum validation rejects unknown transaction type") {
    val env = Seq((100L, "x1", "bogus_v1", "{}"))
      .toDF("block", "hash", "type", "fields")
    val ex = intercept[Exception] { validateTxnType(env).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("bogus_v1")))
  }

  test("K2 enum validation passes all 34 known types") {
    val env = transactionTypes.zipWithIndex
      .map { case (t, i) => (100L, s"h$i", t, "{}") }
      .toDF("block", "hash", "type", "fields")
    assert(validateTxnType(env).count() == 34)
  }

  test("T7 partitionFilters splits by type") {
    val filters = Seq(("account", "a1"), ("account", "a2"), ("gateway", "g1"))
      .toDF("type", "value")
    val lists = partitionFilters(filters)
    assert(lists == Allowlists(Set("a1", "a2"), Set("g1")))
  }
}
