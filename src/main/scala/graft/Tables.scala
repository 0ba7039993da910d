package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loaders + oracle-parity numeric helpers.
  *
  * Design note (100 TB): every loader is a plain parquet scan — Catalyst
  * pushes filters/projections into the scan (verified via
  * `.explain("formatted")`, see `PushedFilters`/`ReadSchema`), so queries
  * built on these helpers prune columns and row groups for free. At cluster
  * scale the same code reads a partitioned table root instead of a single
  * file; nothing here assumes single-file inputs.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)    = t(s, d, "region")
  def nation(s: SparkSession, d: String)    = t(s, d, "nation")
  def customer(s: SparkSession, d: String)  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = t(s, d, "supplier")
  def part(s: SparkSession, d: String)      = t(s, d, "part")
  def orders(s: SparkSession, d: String)    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = t(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects unless
    * nanos are read as raw longs; set the switch here so every session that
    * touches events works regardless of builder config. Queries convert with
    * `timestamp_micros(ts div 1000)` (UTC session). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
  }
  def documents(s: SparkSession, d: String) = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")

  /** Cast a double column to an exact decimal before aggregation.
    *
    * Double-sum results depend on accumulation order, which differs between
    * Spark's partial/final aggregation and DuckDB's — and between runs at
    * different parallelism. Summing exact decimals is order-independent, so
    * Spark and the DuckDB oracle agree bit-for-bit; the final cast back to
    * double is deterministic (exact rational → nearest double).
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent sum of a money-like double column, output as double. */
  def sumd(c: Column): Column = sum(dec(c)).cast("double")

  /** Matching DuckDB SQL fragment for [[sumd]]. */
  def sqlSumd(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
}
