package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location — the cluster-scale answer to repeated
  * fact⋈fact joins on the same key (SURVEY §2.4: downstream
  * `rewards ⋈ transactions` on block/hash, and any lineitem⋈orders-shaped
  * join here).
  *
  * Writing both sides bucketed (+sorted) by the join key means every
  * subsequent join on that key is a zero-shuffle sort-merge join: each
  * task reads matching bucket files from both tables. At 100 TB this
  * converts an O(data) shuffle per join into a one-time layout cost —
  * exactly what the reference's Postgres b-tree indexes bought its
  * downstream consumers (migrations/V1:10-11, V3:44-45), re-expressed as
  * physical layout. BucketingSpec asserts the no-Exchange plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table at `path`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)
}
