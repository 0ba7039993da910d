package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.helium.{FixtureNode, Follower, Model, Pipeline}
import graft.helium.Model._

/** The reference's own query surface, oracle-checked end-to-end: these run
  * the actual extraction pipeline (SURVEY §3.1) over the committed block
  * fixtures and aggregate the resulting `rewards`/`transactions` tables the
  * way the reference's Postgres indexes anticipate
  * (migrations/V1__create_rewards.sql:10-11 — by gateway, by block;
  * V3:44-45 — by type, by block). The DuckDB oracle replays the same
  * extraction in SQL over the same JSONL, so the whole pipeline —
  * dispatch, enrichment join, flatten, sentinel, allowlists, envelopes —
  * is hash-verified, not just the final rollup.
  *
  * The fixture dir is independent of the driver's sfDir on purpose: these
  * queries exercise the Helium data model, which the TPC-H-ish tables
  * can't.
  */
object HeliumQueries {

  private val fixDir = "/root/repo/src/test/resources/fixtures/basic"

  private def load(s: SparkSession): (DataFrame, DataFrame) = {
    import s.implicits._
    val node = new FixtureNode(fixDir)
    val blockJsons = (0L to node.height()).flatMap(node.getBlockJson)
    val blocks = Follower.parseBlocks(blockJsons.toDF("json"))
    val payloads = s.read.text(s"$fixDir/txns.jsonl")
      .select(from_json(col("value"), Model.txnSchema).as("t")).select("t.*")
    (blocks, payloads)
  }

  private def h01(s: SparkSession, d: String): DataFrame = {
    val (blocks, payloads) = load(s)
    Pipeline.run(EtlMode.Rewards, blocks, payloads).rewards
      .groupBy(col("gateway"))
      .agg(sum(col("amount")).as("total_amount"), count(lit(1)).as("n_rewards"))
  }

  private def h02(s: SparkSession, d: String): DataFrame = {
    val (blocks, payloads) = load(s)
    val lists = Allowlists(accounts = Set("acct1"), gateways = Set("gw2"))
    Pipeline.run(EtlMode.Filters, blocks, payloads, lists).rewards
      .select(col("block"), col("transaction_hash"), col("account"),
        col("gateway"), col("amount"), col("type"))
  }

  private def h03(s: SparkSession, d: String): DataFrame = {
    val (blocks, payloads) = load(s)
    Pipeline.run(EtlMode.Full, blocks, payloads).transactions.get
      .groupBy(col("type"))
      .agg(count(lit(1)).as("n_txns"), min(col("block")).as("first_block"))
  }

  /** §2.6 parity note made real: per-gateway reward deltas across blocks
    * (`Window.partitionBy(gateway).orderBy(block)`) over the pipeline's
    * own output. */
  private def h04(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (blocks, payloads) = load(s)
    val w = Window.partitionBy(col("gateway"))
      .orderBy(col("block"), col("type"))
    Pipeline.run(EtlMode.Rewards, blocks, payloads).rewards
      .withColumn("prev_amount", lag(col("amount"), 1).over(w))
      .filter(col("prev_amount").isNotNull)
      .select(col("gateway"), col("block"), col("type"),
        (col("amount") - col("prev_amount")).as("delta"))
  }

  /** The cross-table join the reference's indexes anticipate
    * (migrations/V1:10-11 `rewards(transaction_hash)` ⋈ V3 transactions):
    * reward rows joined back to their envelope. At fixture scale the
    * envelope side broadcasts; at chain scale both tables are written
    * partitioned by batch (ExactlyOnceSink), so the equi-join on hash
    * shuffles once — or not at all if both sinks are bucketed by hash
    * ([[graft.operators.Bucketing]]). */
  private def h05(s: SparkSession, d: String): DataFrame = {
    val (blocks, payloads) = load(s)
    val out = Pipeline.run(EtlMode.Full, blocks, payloads)
    val tx = out.transactions.get
      .select(col("hash"), col("type").as("txn_type"))
    out.rewards
      .join(broadcast(tx), col("transaction_hash") === col("hash"))
      .groupBy(col("block"), col("txn_type"))
      .agg(count(lit(1)).as("n_rewards"),
        sum(col("amount")).as("total_amount"))
  }

  /** Query-time typed view over STORED envelopes (T9 at read time): what a
    * downstream consumer of the reference's Postgres does with
    * `fields::jsonb` — re-parse the opaque payload with the rewards_v2
    * schema and aggregate inside it. The pipeline stored `fields` opaque
    * (K2 parity); `from_json` makes it columnar again at query time, and
    * Catalyst prunes the parse to just the accessed fields. */
  private def h06(s: SparkSession, d: String): DataFrame = {
    val (blocks, payloads) = load(s)
    val tx = Pipeline.run(EtlMode.Full, blocks, payloads).transactions.get
    tx.filter(col("type") === "rewards_v2")
      .withColumn("p", from_json(col("fields"), Model.rewardsV2Schema))
      .select(col("block"), explode(col("p.rewards")).as("r"))
      .groupBy(col("r.type").as("reward_type"))
      .agg(
        count(lit(1)).as("n_rewards"),
        sum(col("r.amount")).as("total_amount"),
        countDistinct(col("block")).as("n_blocks"))
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "h01_rewards_by_gateway" -> h01 _,
    "h02_rewards_filters_mode" -> h02 _,
    "h03_txn_envelopes_by_type" -> h03 _,
    "h04_reward_deltas" -> h04 _,
    "h05_rewards_txn_join" -> h05 _,
    "h06_payload_typed_view" -> h06 _,
  )

  private val flatCte =
    s"""WITH stubs AS (
       |  SELECT b.height AS block, b.time, t.hash, t.type
       |  FROM read_json_auto('$fixDir/blocks.jsonl') b,
       |       UNNEST(b.transactions) AS u(t)
       |),
       |payloads AS (
       |  SELECT hash, type, fields FROM read_json_auto('$fixDir/txns.jsonl')
       |),
       |flat AS (
       |  SELECT s.block, s.hash AS transaction_hash, s.time,
       |         r.account, r.gateway, r.amount, r.type
       |  FROM stubs s
       |  JOIN payloads p ON s.hash = p.hash
       |  , UNNEST(json_transform(p.fields,
       |      '{"rewards":[{"account":"VARCHAR","gateway":"VARCHAR","amount":"BIGINT","type":"VARCHAR"}]}').rewards) AS ur(r)
       |  WHERE s.type = 'rewards_v2'
       |)""".stripMargin

  val oracle: ListMap[String, String] = ListMap(
    "h01_rewards_by_gateway" ->
      s"""$flatCte
         |SELECT COALESCE(gateway, '1Wh4bh') AS gateway,
         |       SUM(amount)::BIGINT AS total_amount, COUNT(*) AS n_rewards
         |FROM flat GROUP BY 1""".stripMargin,
    "h02_rewards_filters_mode" ->
      s"""$flatCte
         |SELECT block, transaction_hash,
         |       COALESCE(account, '1Wh4bh') AS account,
         |       COALESCE(gateway, '1Wh4bh') AS gateway, amount, type
         |FROM flat
         |WHERE account IN ('acct1') OR gateway IN ('gw2')""".stripMargin,
    "h04_reward_deltas" ->
      s"""$flatCte
         |SELECT gateway, block, type, amount - prev_amount AS delta FROM (
         |  SELECT COALESCE(gateway, '1Wh4bh') AS gateway, block, type, amount,
         |    LAG(amount) OVER (PARTITION BY COALESCE(gateway, '1Wh4bh')
         |      ORDER BY block, type) AS prev_amount
         |  FROM flat)
         |WHERE prev_amount IS NOT NULL""".stripMargin,
    "h03_txn_envelopes_by_type" ->
      s"""WITH stubs AS (
         |  SELECT b.height AS block, t.hash, t.type
         |  FROM read_json_auto('$fixDir/blocks.jsonl') b,
         |       UNNEST(b.transactions) AS u(t)
         |),
         |payloads AS (
         |  SELECT hash, fields FROM read_json_auto('$fixDir/txns.jsonl')
         |)
         |SELECT s.type, COUNT(*) AS n_txns, MIN(s.block) AS first_block
         |FROM stubs s JOIN payloads p ON s.hash = p.hash
         |GROUP BY s.type""".stripMargin,
    "h05_rewards_txn_join" ->
      s"""$flatCte
         |SELECT f.block, p.type AS txn_type,
         |  COUNT(*) AS n_rewards, SUM(f.amount)::BIGINT AS total_amount
         |FROM flat f
         |JOIN (SELECT hash, type FROM read_json_auto('$fixDir/txns.jsonl')) p
         |  ON f.transaction_hash = p.hash
         |GROUP BY 1, 2""".stripMargin,
    "h06_payload_typed_view" ->
      s"""$flatCte
         |SELECT type AS reward_type, COUNT(*) AS n_rewards,
         |  SUM(amount)::BIGINT AS total_amount,
         |  COUNT(DISTINCT block) AS n_blocks
         |FROM flat GROUP BY 1""".stripMargin,
  )
}
