package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (SURVEY §2 inventory plus
  * the LLM-data-pipeline extensions); each key with a matching [[oracleSql]]
  * entry is hash-checked against DuckDB at sf0.01 by the driver.
  */
object SparkEntry {

  /** Apply `SPARK_GRAFT_CONF=k=v,k=v` session overrides — the one
    * iteration knob Bench and Verify share, factored so the two entry
    * points cannot drift to different conf syntaxes. */
  def applyEnvConf(spark: SparkSession): Unit =
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(',').filter(_.nonEmpty)
      .foreach { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"bad SPARK_GRAFT_CONF entry: $kv")
        spark.conf.set(kv.take(i), kv.drop(i + 1))
      })

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the star-join revenue rollup — the densest single exercise of the
    * surface (broadcast dims, fact shuffle, decimal-exact aggregation). */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_star_join_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap.empty ++
      graft.queries.Relational.queries ++
      graft.queries.AdvancedOps.queries ++
      graft.queries.EventsOps.queries ++
      graft.queries.HeliumQueries.queries ++
      graft.queries.TextDedupOps.queries ++
      graft.queries.SimilarityOps.queries ++
      graft.queries.MultimodalOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    ListMap.empty ++
      graft.queries.Relational.oracle ++
      graft.queries.AdvancedOps.oracle ++
      graft.queries.EventsOps.oracle ++
      graft.queries.HeliumQueries.oracle ++
      graft.queries.TextDedupOps.oracle ++
      graft.queries.SimilarityOps.oracle ++
      graft.queries.MultimodalOps.oracle
}
