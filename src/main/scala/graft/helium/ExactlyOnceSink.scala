package graft.helium

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import Model._

/** K1/K2/K4 — the exactly-once block-range commit unit.
  *
  * The reference wraps each block's inserts + cursor advance in one Postgres
  * transaction (src/follower.rs:100-106, src/block_processor.rs:44-47).
  * Spark's equivalent (SURVEY §2.2 K4): make the data write *idempotent per
  * batch* and advance the cursor only after the write succeeds:
  *
  *   - every batch writes with `batch_id=<max block height in the batch>`
  *     as a partition value using dynamic partition overwrite. The key is
  *     derived from the batch's CONTENT, not the streaming engine's epoch
  *     counter, so replays stay idempotent even if the checkpoint directory
  *     is lost and epoch ids restart at 0: the same height range always
  *     lands on the same partition. If a post-reset replay covers a wider
  *     range (more blocks arrived), the stale uncommitted partition —
  *     recognizable as any id above the durable cursor — is dropped first;
  *   - the cursor ([[StateStore]]) moves forward only on success.
  *
  * At 100 TB this layout also gives partition pruning on batch ranges, and
  * each batch's files are written in parallel by all executors — there is
  * no coordinator bottleneck like the reference's single Postgres
  * connection (SURVEY §3.1 control-crossing summary).
  */
class ExactlyOnceSink(spark: SparkSession, root: String) extends Serializable {
  val state = new StateStore(spark, root)

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(table: String) = new Path(s"$root/$table")
  private def tmpDir(table: String) = new Path(s"$root/_compact_$table")
  private def manifestPath(table: String) =
    new Path(s"$root/_compact_$table.manifest")

  private def partitionIds(table: String): Seq[Long] = {
    val dir = tableDir(table)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).toSeq
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
  }

  private def markerPath(table: String, id: Long): Path =
    new Path(tableDir(table), s"batch_id=$id/_COMMITTED")

  /** Positive partition ids whose BATCH committed: the `_COMMITTED` marker
    * is created by [[commit]] only after EVERY table's parquet write for
    * the batch has returned, so a partition left by a crash anywhere
    * mid-batch never carries one — in any table. Underscore-prefixed
    * files are invisible to Spark's readers, and compaction deletes
    * source partitions wholesale, marker included. */
  private def committedIds(table: String): Seq[Long] =
    partitionIds(table).filter(id => id >= 0 && fs.exists(markerPath(table, id)))

  private[helium] def writeBatch(df: DataFrame, table: String, key: Long,
      prevCursor: Long): Unit = {
    // Any positive partition above the durable cursor is an uncommitted
    // leftover of a crashed attempt — INCLUDING one at this batch's own
    // key: deleting it up front (rather than relying on dynamic overwrite,
    // which touches nothing when the batch is empty) guarantees the final
    // on-disk state is exactly this write's output, so a later marker on
    // the key dir can never bless stale content.
    partitionIds(table)
      .filter(id => id >= 0 && id > prevCursor)
      .foreach(id => fs.delete(new Path(tableDir(table), s"batch_id=$id"), true))
    df.withColumn("batch_id", lit(key))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(s"$root/$table")
  }

  /** Stamp the batch-level commit record on `key`'s partition. An empty
    * batch gets a marker-only directory: underscore files are invisible
    * to Spark's readers (zero rows), but the marker keeps this table's
    * marked maximum in lock-step with the other table's, so the joint
    * MIN floor never drags a legitimately-empty table's watermark behind
    * and over-sweeps the other's committed history on cursor loss. The
    * up-front delete in [[writeBatch]] guarantees a data-bearing dir here
    * is this write's product, never stale content. */
  private def markCommitted(table: String, key: Long): Unit = {
    val pdir = new Path(tableDir(table), s"batch_id=$key")
    if (!fs.exists(pdir)) fs.mkdirs(pdir)
    fs.create(markerPath(table, key), true).close()
  }

  /** Commit one batch: rewards (+ transactions in Full mode) then cursor.
    * `maxHeight` is the highest block height contained in the batch — both
    * the partition key and the cursor value after commit, exactly like
    * `follower_info.height` after the reference's per-block txn. */
  def commit(out: Pipeline.Output, maxHeight: Long,
      firstBlock: Long): Unit = {
    // Cursor-loss guard: if the StateStore file is missing/corrupt while
    // data partitions survive (metadata-only failure), a MinValue cursor
    // would make the stale-partition sweep delete ALL committed history.
    // Derive a floor from MARKED partitions instead — and because markers
    // are stamped only after EVERY table's write (below), take the MIN of
    // the per-table marked maxima: a batch marked in one table but not
    // the other (crash between the two marker stamps) is below the joint
    // floor in the lagging table, so BOTH tables' partials above it are
    // swept and the replay rebuilds the batch consistently across tables.
    val prev = state.load().map(_.height).getOrElse {
      val perTable = Seq("rewards", "transactions")
        .map(committedIds).filter(_.nonEmpty)
      if (perTable.nonEmpty) perTable.map(_.max).min
      else {
        // Legacy fallback: a table written before markers existed has data
        // but no markers — a MinValue floor would sweep ALL its committed
        // history. Fall back to the round-3 rule (max existing positive
        // id = committed); only tables with at least one marked partition
        // get the stricter partial-write discrimination.
        val existing = (partitionIds("rewards") ++ partitionIds("transactions"))
          .filter(_ >= 0)
        if (existing.isEmpty) Long.MinValue else existing.max
      }
    }
    writeBatch(out.rewards, "rewards", maxHeight, prev)
    out.transactions.foreach(writeBatch(_, "transactions", maxHeight, prev))
    // Batch-level commit record: stamped only once ALL tables' data for
    // this batch is on disk, then the cursor. A crash before any stamp
    // replays the whole batch; a crash between stamps leaves the joint
    // floor (min over tables) below this batch, so it replays too.
    markCommitted("rewards", maxHeight)
    out.transactions.foreach(_ => markCommitted("transactions", maxHeight))
    state.advance(IngestState(maxHeight, firstBlock))
  }

  def rewardsTable(): DataFrame = {
    recover("rewards")
    spark.read.parquet(s"$root/rewards")
  }
  def transactionsTable(): DataFrame = {
    recover("transactions")
    spark.read.parquet(s"$root/transactions")
  }

  /** Compact closed batches: every positive `batch_id` partition except the
    * newest, plus all previous consolidated generations, is rewritten into
    * one NEW consolidated partition (`batch_id = -generation`, decreasing)
    * with `targetPartitions` files.
    *
    * Why safe: the cursor is monotonic and replay can only re-run the
    * batch *after* the stored cursor, i.e. at most the newest committed
    * batch — which compaction never touches. Why needed: a 10 s trigger
    * writes ~8.6k batch partitions/day; at cluster scale the accumulated
    * small files dominate scan planning cost. Compaction is the standard
    * maintenance pass (cf. Delta OPTIMIZE), expressed on plain parquet.
    *
    * Crash safety: the consolidated data is staged outside the table, then
    * a manifest (newGen + source ids) is persisted as the commit point,
    * then the swap runs: one atomic directory rename publishes the new
    * generation, and only after that do the superseded source partitions
    * get deleted (idempotent final step). [[recover]] rolls an interrupted
    * swap forward from the manifest — there is no window where committed
    * history exists solely in the staging directory. */
  def compact(table: String, targetPartitions: Int = 8): Unit = {
    recover(table) // finish any interrupted swap before planning a new one
    val dir = tableDir(table)
    if (!fs.exists(dir)) return
    val ids = partitionIds(table)
    val closed = ids.filter(_ >= 0).sorted.dropRight(1)
    if (closed.isEmpty) return
    val gens = ids.filter(_ < 0)
    val newGen = (gens :+ 0L).min - 1
    val sources = closed ++ gens

    val tmp = tmpDir(table)
    fs.delete(tmp, true) // a tmp without manifest is a dead write
    val keep = sources.map(x => x: Any)
    spark.read.parquet(s"$root/$table")
      .filter(col("batch_id").isin(keep: _*))
      .drop("batch_id")
      .repartition(targetPartitions)
      .write.mode("overwrite").parquet(tmp.toString)

    // Commit point. Written via create-then-rename so the manifest is
    // either absent or complete, never truncated.
    val mf = manifestPath(table)
    val mfTmp = new Path(mf.toString + ".tmp")
    val out = fs.create(mfTmp, true)
    out.write(s"$newGen\n${sources.mkString(",")}\n".getBytes("UTF-8"))
    out.close()
    // Hadoop rename reports most failures by RETURNING FALSE, not throwing.
    // An unchecked false here would fall through to finishSwap and delete
    // source partitions without a commit point on disk.
    if (!fs.rename(mfTmp, mf))
      throw new java.io.IOException(
        s"compact($table): manifest rename $mfTmp -> $mf failed; aborting " +
          "before swap (sources and staging untouched)")

    finishSwap(table, newGen, sources)
  }

  /** Finish-or-rollback check for an interrupted [[compact]]. Idempotent;
    * called on every table read and at the start of every compaction. */
  def recover(table: String): Unit = {
    val mf = manifestPath(table)
    if (!fs.exists(mf)) {
      // staging data without a commit point: roll back
      fs.delete(tmpDir(table), true)
      return
    }
    val in = fs.open(mf)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = txt.split("\n")
    val newGen = lines(0).trim.toLong
    val sources =
      if (lines.length > 1 && lines(1).trim.nonEmpty)
        lines(1).trim.split(",").map(_.toLong).toSeq
      else Seq.empty[Long]
    finishSwap(table, newGen, sources)
  }

  /** The swap, entered only once the manifest exists: publish the new
    * generation by a single atomic rename, then delete the superseded
    * sources, then drop the manifest. Every step is idempotent, so a crash
    * anywhere re-runs to completion via [[recover]]. */
  private def finishSwap(table: String, newGen: Long,
      sources: Seq[Long]): Unit = {
    val dir = tableDir(table)
    val dest = new Path(dir, s"batch_id=$newGen")
    val tmp = tmpDir(table)
    if (!fs.exists(dest)) {
      if (!fs.exists(tmp)) {
        // staging lost before publish — roll back, sources are untouched
        fs.delete(manifestPath(table), false)
        return
      }
      fs.delete(new Path(tmp, "_SUCCESS"), false)
      // The publish: one atomic directory rename. rename=false (not an
      // exception) is how Hadoop FS reports most failures — proceeding
      // would delete the sources AND the staged replacement, losing all
      // compacted history. Abort with everything intact; recover() retries.
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(
          s"compact($table): publish rename $tmp -> $dest failed; aborting " +
            "with sources, staging, and manifest intact")
    }
    sources.foreach(b => fs.delete(new Path(dir, s"batch_id=$b"), true))
    fs.delete(tmp, true)
    fs.delete(manifestPath(table), false)
  }
}
