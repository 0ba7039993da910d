package graft.helium

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import Model._
import Transforms._

/** Property-based invariants (SURVEY §5.2): random reward vectors through
  * the transform chain — plain ScalaCheck generators sampled with fixed
  * seeds (no scalatest bridge needed; each sample runs real Spark jobs so
  * a small deterministic sample count beats forAll's default 100). */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val addr = Gen.oneOf(
    Gen.const(None),
    Gen.alphaNumStr.map(s => Some("a" + s.take(8))))
  private val rewardGen = for {
    account <- addr
    gateway <- addr
    amount <- Gen.chooseNum(0L, 1L << 40)
    typ <- Gen.oneOf("poc_challengees", "poc_witnesses", "securities", "overages")
  } yield (account, gateway, amount, typ)
  private val rewardsGen = Gen.chooseNum(0, 30).flatMap(Gen.listOfN(_, rewardGen))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("flatten preserves reward count and amount sum") {
    samples(rewardsGen, 8).foreach { rs =>
      val json =
        s"""{"start_epoch":1,"end_epoch":2,"rewards":[${
          rs.map { case (a, g, am, t) =>
            s"""{"account":${a.map("\"" + _ + "\"").getOrElse("null")},""" +
              s""""gateway":${g.map("\"" + _ + "\"").getOrElse("null")},""" +
              s""""amount":$am,"type":"$t"}"""
          }.mkString(",")}]}"""
      val enriched = Seq((100L, 1600L, "bh", "rx", "rewards_v2", json))
        .toDF("block", "time", "block_hash", "hash", "type", "fields")
      val flat = flattenRewards(parseRewardsPayload(enriched))
      assert(flat.count() == rs.length)
      if (rs.nonEmpty)
        assert(flat.agg(sum("amount")).head().getLong(0) == rs.map(_._3).sum)
    }
  }

  test("filters-mode output is always a subset of rewards-mode output, " +
    "null keys never match, kept accounts are allowlisted") {
    val acctsGen = Gen.listOf(Gen.alphaNumStr.map("a" + _.take(8)))
    samples(Gen.zip(rewardsGen, acctsGen), 8).foreach { case (rs, accts) =>
      val df = rs.zipWithIndex.map { case ((a, g, am, t), i) =>
        (100L, s"r$i", 1L, a, g, am, t)
      }.toDF("block", "transaction_hash", "time", "account", "gateway",
        "amount", "type")
      val lists = Allowlists(accts.toSet, Set.empty)
      val filtered = allowlistFilter(lists)(df)
      assert(filtered.count() <= df.count())
      assert(filtered.filter(col("account").isNull).count() == 0)
      val kept = filtered.select("account").as[String].collect()
      assert(kept.forall(accts.contains))
    }
  }

  test("sentinel substitution is idempotent and total") {
    samples(rewardsGen, 8).foreach { rs =>
      val df = rs.zipWithIndex.map { case ((a, g, am, t), i) =>
        (100L, s"r$i", 1L, a, g, am, t)
      }.toDF("block", "transaction_hash", "time", "account", "gateway",
        "amount", "type")
      val once = sentinelNulls(df)
      val twice = sentinelNulls(once)
      assert(once.collect().toSeq == twice.collect().toSeq)
      assert(once.filter(col("account").isNull || col("gateway").isNull)
        .count() == 0)
    }
  }
}
