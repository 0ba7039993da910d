package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampType}

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
  /** `events.ts` has drifted across driver testdata generations: parquet
    * TIMESTAMP(NANOS) (arrives as raw long nanos under the legacy switch) in
    * one vintage, TIMESTAMP_MICROS isAdjustedToUTC=0 (arrives as
    * TIMESTAMP_NTZ) in another. Keep the nanos switch on so the nanos
    * vintage still loads, and let queries adapt per-dtype via [[epochUs]] —
    * a driver-side regeneration then changes the scan, not the results. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
  }

  /** Event time as epoch microseconds, adaptive to how the parquet writer
    * encoded `ts` (see [[events]]): long nanos → integer `div 1000`;
    * TIMESTAMP_NTZ → cast to timestamp (wall-clock identity under the UTC
    * session every entry point pins) then `unix_micros`; plain timestamp →
    * `unix_micros` directly. Matches DuckDB `epoch_us(ts)` bit-for-bit on
    * every vintage. Pure column expression — stays inside whole-stage
    * codegen either way. */
  def epochUs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType      => expr("ts div 1000")
    case TimestampType => unix_micros(col("ts"))
    case _             => unix_micros(col("ts").cast(TimestampType))
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
