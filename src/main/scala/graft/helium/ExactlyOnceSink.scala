package graft.helium

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

import Model._

/** K1/K2/K4 — the exactly-once block-range commit unit.
  *
  * The reference wraps each block's inserts + cursor advance in one Postgres
  * transaction (src/follower.rs:100-106, src/block_processor.rs:44-47).
  * Spark's equivalent (SURVEY §2.2 K4): make the data write *idempotent per
  * batch* and advance the cursor only after the write succeeds:
  *
  *   - every batch writes with `batch_id=<id>` as a partition value using
  *     dynamic partition overwrite, so re-processing a batch (crash before
  *     cursor advance, streaming retry of the same epoch) replaces its own
  *     partition and nothing else;
  *   - the cursor ([[StateStore]]) moves forward only on success.
  *
  * At 100 TB this layout also gives partition pruning on batch ranges, and
  * each batch's files are written in parallel by all executors — there is
  * no coordinator bottleneck like the reference's single Postgres
  * connection (SURVEY §3.1 control-crossing summary).
  */
class ExactlyOnceSink(spark: SparkSession, root: String) extends Serializable {
  val state = new StateStore(spark, root)

  private def writeBatch(df: DataFrame, table: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(s"$root/$table")

  /** Commit one batch: rewards (+ transactions in Full mode) then cursor.
    * `maxHeight` is the highest block height contained in the batch — the
    * cursor value after commit, exactly like `follower_info.height` after
    * the reference's per-block txn. */
  def commit(out: Pipeline.Output, batchId: Long, maxHeight: Long,
      firstBlock: Long): Unit = {
    writeBatch(out.rewards, "rewards", batchId)
    out.transactions.foreach(writeBatch(_, "transactions", batchId))
    state.advance(IngestState(maxHeight, firstBlock))
  }

  def rewardsTable(): DataFrame = spark.read.parquet(s"$root/rewards")
  def transactionsTable(): DataFrame = spark.read.parquet(s"$root/transactions")
}
