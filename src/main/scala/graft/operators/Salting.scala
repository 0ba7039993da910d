package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual fallback when AQE's
  * runtime skew handling isn't enough (e.g. one gateway receiving a large
  * share of all rewards, one hot user_id in events: a single reducer gets
  * the whole key while the rest of the cluster idles).
  *
  * Aggregation: split each hot key into `salts` sub-keys, partially
  * aggregate per sub-key (parallel), then combine per original key — the
  * standard two-phase rewrite, exact for decomposable aggregates.
  *
  * Join: replicate the small side once per salt, scatter the big side's
  * rows randomly across salts; every original match still meets exactly
  * once because the join key carries (key, salt).
  */
object Salting {

  private def saltCol(salts: Int): Column =
    pmod((rand(42) * salts).cast("int"), lit(salts))

  /** Two-phase salted sum/count over a possibly-skewed key. Exact: sum and
    * count are decomposable, so pre-aggregating per (key, salt) then
    * combining per key gives identical results with `salts`-way parallel
    * reduction of the hot key. Pass an exact-typed value expression
    * (decimal/long) when the result must be independent of the salt
    * grouping (double partial sums are order-sensitive). */
  def saltedSumCount(df: DataFrame, key: String, value: Column,
      outName: String, salts: Int): DataFrame =
    df.withColumn("__salt", saltCol(salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(outName),
        sum(col("__pcnt")).as("n_rows"))

  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame =
    saltedSumCount(df, key, col(valueCol), s"sum_$valueCol", salts)

  /** Salted broadcast-free join: big side scattered across salts, small
    * side replicated per salt. Result equals `big.join(small, key)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(salts))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
