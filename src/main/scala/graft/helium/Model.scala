package graft.helium

import org.apache.spark.sql.types._

/** Data model of the Helium block stream, re-expressed as Spark schemas.
  *
  * Sources (all /root/reference/): block fields used at
  * src/block_processor.rs:52-73 (`height`, `time`, `hash`, `transactions`);
  * reward shape src/reward.rs:15-44 and migrations/V1__create_rewards.sql;
  * envelope shape migrations/V3__create_transactions.sql:38-46; enum values
  * migrations/V3__create_transactions.sql:1-36 + V5__add_transfer_hotspot_v2
  * .sql:1; follower cursor migrations/V2__create_follower_info.sql.
  */
object Model {

  /** The 34-value `transaction_type` enum. Spark SQL has no enum type;
    * [[Transforms.validateTxnType]] enforces it at load time the way the
    * reference's insert-time `CAST(... AS "transaction_type")` does
    * (src/transaction.rs:9). */
  val transactionTypes: Seq[String] = Seq(
    "coinbase_v1", "security_coinbase_v1", "oui_v1", "gen_gateway_v1",
    "routing_v1", "payment_v1", "security_exchange_v1", "consensus_group_v1",
    "add_gateway_v1", "assert_location_v1", "create_htlc_v1",
    "redeem_htlc_v1", "poc_request_v1", "poc_receipts_v1", "vars_v1",
    "rewards_v1", "token_burn_v1", "dc_coinbase_v1",
    "token_burn_exchange_rate_v1", "payment_v2", "state_channel_open_v1",
    "state_channel_close_v1", "price_oracle_v1", "transfer_hotspot_v1",
    "rewards_v2", "assert_location_v2", "gen_validator_v1",
    "stake_validator_v1", "unstake_validator_v1", "validator_heartbeat_v1",
    "transfer_validator_stake_v1", "gen_price_oracle_v1",
    "consensus_group_failure_v1", "transfer_hotspot_v2")

  /** Null sentinel for absent account/gateway (src/reward.rs:22,
    * README.md:111 — "1Wh4bh" is the hash of null). */
  val NullSentinel = "1Wh4bh"

  /** A txn stub as returned by `blocks::get_raw` — hash + type only
    * (the classic lazy column: payloads are fetched separately, S3). */
  val stubSchema: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("type", StringType, nullable = false)))

  /** A raw block: header + txn stubs (src/block_processor.rs:52-73). */
  val blockSchema: StructType = StructType(Seq(
    StructField("height", LongType, nullable = false),
    StructField("time", LongType, nullable = false),
    StructField("hash", StringType, nullable = false),
    StructField("transactions", ArrayType(stubSchema, containsNull = false))))

  /** Full txn payload as returned by `transactions::get`: the envelope plus
    * a JSON `fields` body (jsonb parity, src/transaction.rs:22). */
  val txnSchema: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("fields", StringType, nullable = false)))

  /** Typed view of a rewards_v2 payload (T9): the union variant the
    * reference pattern-matches at src/block_processor.rs:59-64. */
  val rewardsV2Schema: StructType = StructType(Seq(
    StructField("start_epoch", LongType),
    StructField("end_epoch", LongType),
    StructField("rewards", ArrayType(StructType(Seq(
      StructField("account", StringType),
      StructField("gateway", StringType),
      StructField("amount", LongType),
      StructField("type", StringType)))))))

  /** Output row of the rewards table (migrations/V1__create_rewards.sql). */
  case class Reward(
      block: Long,
      transaction_hash: String,
      time: Long,
      account: String,
      gateway: String,
      amount: Long,
      `type`: String)

  /** Output row of the transactions table (migrations/V3:38-46). */
  case class TxnEnvelope(block: Long, hash: String, `type`: String, fields: String)

  /** The follower cursor (migrations/V2__create_follower_info.sql). */
  case class IngestState(height: Long, first_block: Long)

  /** Allowlists loaded from the filters table (src/filter.rs:4-7). */
  case class Allowlists(accounts: Set[String], gateways: Set[String])

  /** ETL mode (src/settings.rs:7-12). */
  sealed trait EtlMode
  object EtlMode {
    case object Rewards extends EtlMode
    case object Full extends EtlMode
    case object Filters extends EtlMode
    /** Parity with deserialize_etl_mode's lowercase match (src/settings.rs:74). */
    def parse(s: String): EtlMode = s.toLowerCase match {
      case "rewards" => Rewards
      case "full"    => Full
      case "filters" => Filters
      case other => throw new IllegalArgumentException(
        s"unknown etl mode '$other' (expected rewards|full|filters)")
    }
  }
}
