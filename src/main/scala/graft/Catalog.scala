package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface entry point: register every testdata table as a temp view so
  * the whole engine is reachable through `spark.sql(...)` — the reference's
  * own query interface is SQL over its Postgres schema (SURVEY §2 preamble),
  * and this is the Spark-native equivalent for the analytics tables.
  * (The Helium ingest tables get real catalog entries via
  * [[graft.helium.Migrate]]; these are the driver-provided read-only inputs,
  * hence temp views.)
  */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach {
      // events must go through Tables.events, which flips the nanosAsLong
      // switch so the TIMESTAMP(NANOS) testdata vintage still loads —
      // Tables.t would make view registration fail on that vintage in any
      // session that hasn't touched events yet (latent order-dependence
      // the shared test session masked)
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t => Tables.t(spark, dir, t).createOrReplaceTempView(t)
    }
}
