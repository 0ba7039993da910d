package graft.helium

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Model._

/** The reference's hard-coded Rust transforms T1–T9 (SURVEY §2.3) as pure,
  * composable `DataFrame => DataFrame` functions — no UDFs anywhere; every
  * step is built-in Column expressions so the whole chain stays inside
  * whole-stage codegen and Catalyst can push the type-dispatch predicate and
  * column pruning into the source scan.
  *
  * Scale notes: the only shuffle in the entire extraction path is the
  * stub⋈payload enrichment join, and that one is broadcast when the payload
  * side is a per-micro-batch fetch (small) or a shuffled hash join keyed on
  * `hash` at backfill scale. `explode` is a Generate node — narrow, no
  * shuffle. The allowlist filter is a broadcast `isin`, matching the
  * reference's in-memory set probe (src/block_processor.rs:80-121).
  */
object Transforms {

  /** Explode a raw block's stubs: one row per (block, stub) — the loop at
    * src/block_processor.rs:55-56. Narrow transform. */
  def explodeStubs(blocks: DataFrame): DataFrame =
    blocks.select(
      col("height").as("block"), col("time"), col("hash").as("block_hash"),
      explode(col("transactions")).as("txn"))
      .select(col("block"), col("time"), col("block_hash"),
        col("txn.hash").as("hash"), col("txn.type").as("type"))

  /** T1 — type-dispatch predicate (src/block_processor.rs:56): only
    * rewards_v2 stubs proceed to payload fetch. Catalyst pushes this below
    * the enrichment join, which is exactly the reference's "don't fetch
    * what you won't load" laziness (SURVEY §4 column-pruning row). */
  def dispatchRewards(stubs: DataFrame): DataFrame =
    stubs.filter(col("type") === "rewards_v2")

  /** S3 — stub ⋈ payload enrichment. The reference does this as one RPC per
    * hash (the N+1 it's famous for, src/block_processor.rs:58); here it is
    * a single equi-join on `hash`. Callers broadcast whichever side is
    * small. */
  def enrichStubs(stubs: DataFrame, payloads: DataFrame): DataFrame =
    stubs.join(payloads.select(col("hash"), col("fields")), Seq("hash"))

  /** T9 — variant → typed payload (src/block_processor.rs:59-64): parse the
    * JSON body with the rewards_v2 schema. A malformed body yields nulls,
    * which [[flattenRewards]] then drops — the reference instead aborts the
    * block; use [[strictRewardsPayload]] for abort-parity. */
  def parseRewardsPayload(enriched: DataFrame): DataFrame =
    enriched.withColumn("payload", from_json(col("fields"), rewardsV2Schema))

  /** Abort-parity variant of [[parseRewardsPayload]]: any rewards_v2 txn
    * whose payload does not parse kills the batch, like the `_ =>` arm at
    * src/block_processor.rs:61-63. */
  def strictRewardsPayload(enriched: DataFrame): DataFrame =
    parseRewardsPayload(enriched).withColumn("payload",
      // malformed JSON under PERMISSIVE parsing yields an all-null struct,
      // so probe the required `rewards` field, not just the struct
      when(col("payload").isNull || col("payload.rewards").isNull,
        raise_error(concat(lit("Error getting rewards txn: '"), col("hash"), lit("'"))))
        .otherwise(col("payload")))

  /** T2 + T3 — flatten `rewards.rewards` (src/block_processor.rs:60,70) and
    * attach block context (rs:73): one output row per reward with the
    * 7-column shape of migrations/V1. */
  def flattenRewards(parsed: DataFrame): DataFrame =
    parsed.select(
      col("block"), col("hash").as("transaction_hash"), col("time"),
      explode(col("payload.rewards")).as("r"))
      .select(col("block"), col("transaction_hash"), col("time"),
        col("r.account").as("account"), col("r.gateway").as("gateway"),
        col("r.amount").as("amount"), col("r.type").as("type"))

  /** T4 — null-sentinel coalesce (src/reward.rs:21-33): absent account
    * (overages) or gateway (securities) becomes "1Wh4bh". */
  def sentinelNulls(rewards: DataFrame): DataFrame =
    rewards
      .withColumn("account", coalesce(col("account"), lit(NullSentinel)))
      .withColumn("gateway", coalesce(col("gateway"), lit(NullSentinel)))

  /** T6 — allowlist membership filter (Filters mode,
    * src/block_processor.rs:80-121): keep a reward iff account ∈ accounts
    * OR gateway ∈ gateways. The reference's `continue 'rloop` means a
    * doubly-matching reward loads exactly once — a filter (not a join)
    * reproduces that by construction. Sets ship to executors as literal
    * arrays (broadcast-equivalent for allowlist cardinalities; the
    * reference also holds them in memory, src/filter.rs:4-7).
    *
    * Note the reference matches BEFORE sentinel substitution (account is
    * still Option), so apply this to pre-sentinel rows; a null key simply
    * never matches, same as its `None => ()` arms. */
  def allowlistFilter(lists: Allowlists)(rewards: DataFrame): DataFrame = {
    val accountHit: Column =
      if (lists.accounts.isEmpty) lit(false)
      else col("account").isin(lists.accounts.toSeq: _*)
    val gatewayHit: Column =
      if (lists.gateways.isEmpty) lit(false)
      else col("gateway").isin(lists.gateways.toSeq: _*)
    rewards.filter(accountHit || gatewayHit)
  }

  /** T7 — split the filters table into the two allowlists
    * (src/filter.rs:26-36). Collects to the driver: allowlists are
    * config-sized by design in the reference too. */
  def partitionFilters(filters: DataFrame): Allowlists = {
    val byType = filters
      .groupBy(col("type"))
      .agg(collect_list(col("value")).as("values"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet)
      .toMap
    Allowlists(
      accounts = byType.getOrElse("account", Set.empty),
      gateways = byType.getOrElse("gateway", Set.empty))
  }

  /** K2 parity — text→enum cast failure (src/transaction.rs:9): an unknown
    * txn type aborts the batch instead of loading silently. */
  def validateTxnType(envelopes: DataFrame): DataFrame =
    envelopes.withColumn("type",
      when(col("type").isin(transactionTypes: _*), col("type"))
        .otherwise(raise_error(concat(
          lit("invalid input value for enum transaction_type: \""),
          col("type"), lit("\"")))))

  /** Full-mode envelope projection (K2, src/transaction.rs:16-34): the
    * 4-column transactions shape with validated type. `fields` is already
    * the serialized JSON payload (jsonb parity). */
  def toEnvelopes(enrichedAll: DataFrame): DataFrame =
    validateTxnType(enrichedAll.select(
      col("block"), col("hash"), col("type"), col("fields")))
}
