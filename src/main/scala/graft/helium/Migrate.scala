package graft.helium

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** K6 — schema migration runner parity (src/migrate.rs:4-18, invoked by the
  * `migrate` CLI subcommand, src/main.rs:39-42; DDL ground truth
  * migrations/V1–V5).
  *
  * The reference applies versioned Postgres DDL; here each "migration"
  * idempotently registers an external parquet table in the Spark catalog
  * with the exact reference schema. Usage: `Migrate.run(spark, root)` or
  * `runMain graft.helium.Migrate <root>`.
  */
object Migrate {

  import org.apache.spark.sql.types._

  /** V1__create_rewards.sql */
  val rewardsSchema: StructType = StructType(Seq(
    StructField("block", LongType, nullable = false),
    StructField("transaction_hash", StringType, nullable = false),
    StructField("time", LongType, nullable = false),
    StructField("account", StringType, nullable = false),
    StructField("gateway", StringType, nullable = false),
    StructField("amount", LongType, nullable = false),
    StructField("type", StringType, nullable = false)))

  /** V3__create_transactions.sql:38-46 */
  val transactionsSchema: StructType = StructType(Seq(
    StructField("block", LongType, nullable = false),
    StructField("hash", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("fields", StringType, nullable = false)))

  /** V4__create_filters.sql */
  val filtersSchema: StructType = StructType(Seq(
    StructField("type", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  private def ddl(schema: StructType): String =
    schema.fields.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")

  /** Apply all migrations: idempotent CREATE TABLE IF NOT EXISTS over
    * external parquet locations under `root` (the batch_id partition
    * column comes from the exactly-once sink). The reference's V2
    * follower_info is the [[StateStore]] — a cursor, not a queryable
    * table, so it is not registered. */
  def run(spark: SparkSession, root: String): Unit = {
    val tables = Seq(
      ("rewards", rewardsSchema, true),
      ("transactions", transactionsSchema, true),
      ("filters", filtersSchema, false))
    tables.foreach { case (name, schema, partitioned) =>
      val part = if (partitioned) ", `batch_id` BIGINT" else ""
      val partBy = if (partitioned) "PARTITIONED BY (batch_id)" else ""
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS $name (${ddl(schema)}$part)
           |USING parquet $partBy LOCATION '$root/$name'""".stripMargin)
      if (partitioned)
        spark.sql(s"MSCK REPAIR TABLE $name") // pick up existing batches
    }
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      sys.error("usage: Migrate <tableRoot>"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    run(spark, root)
    spark.stop()
  }
}
