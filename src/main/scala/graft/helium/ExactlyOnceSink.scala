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
  *   - a `_COMMITTED` marker per partition is the batch-level commit
  *     record: stamped only after every table the batch writes is on
  *     disk, carrying the participant list so recovery can validate a
  *     batch across tables ([[committedFloor]]);
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

  /** All tables the sink can own. */
  private val AllTables = Seq("rewards", "transactions")

  /** Positive partition ids carrying a `_COMMITTED` marker, via ONE
    * globStatus listing (an fs.exists per partition would be O(N)
    * metadata round-trips on the recovery path at ~8.6k partitions/day).
    * A marker alone does not prove the BATCH committed — see
    * [[committedFloor]] for the cross-table validation. */
  private def markedIds(table: String): Seq[Long] = {
    val dir = tableDir(table)
    if (!fs.exists(dir)) Seq.empty
    else fs.globStatus(new Path(dir, "batch_id=*/_COMMITTED")).toSeq
      .map(_.getPath.getParent.getName.stripPrefix("batch_id=").toLong)
      .filter(_ >= 0)
  }

  /** The participant list recorded inside a marker (the tables the batch
    * wrote). Unreadable/empty/unknown content degrades to "all tables" —
    * the CONSERVATIVE direction: demanding more co-markers can only lower
    * the floor and cause replay, never adopt a partial. */
  private def markerParticipants(table: String, id: Long): Seq[String] = {
    try {
      val in = fs.open(markerPath(table, id))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val names = txt.trim.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      if (names.nonEmpty && names.forall(AllTables.contains)) names
      else AllTables
    } catch { case _: java.io.IOException => AllTables }
  }

  /** The highest batch id that provably COMMITTED: some table carries its
    * marker, and every table named inside that marker carries it too.
    * The participant list is what lets the floor tell a table that lags
    * because the batch CRASHED mid-stamp (its id is named but unmarked →
    * batch uncommitted → floor drops below it) from a table that lags
    * because the MODE stopped writing it (not named → irrelevant), so a
    * mode switch can never drag the floor into committed history.
    * Candidates are checked descending — the first validates in the
    * common case, so marker contents are read O(1) times. */
  private def committedFloor(): Option[Long] = {
    val marked = AllTables.map(t => t -> markedIds(t).toSet).toMap
    val candidates = marked.values.flatten.toSeq.distinct.sorted.reverse
    candidates.find { k =>
      val claims = AllTables.filter(t => marked(t).contains(k))
        .map(t => markerParticipants(t, k))
      claims.nonEmpty &&
        claims.flatten.distinct.forall(p => marked(p).contains(k))
    }
  }

  private[helium] def writeBatch(df: DataFrame, table: String,
      key: Long): Unit =
    df.withColumn("batch_id", lit(key))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(s"$root/$table")

  /** Delete positive partitions that are not committed state: anything
    * above the floor, and the replayed batch's own key even when it
    * equals the floor (dynamic overwrite touches nothing when the replay
    * is empty, so without the up-front delete a stale dir at the key
    * could survive and later be marker-stamped). Runs over EVERY table —
    * including ones the current mode no longer writes — so a partial left
    * by a pre-mode-switch crash cannot dangle above the cursor forever. */
  private def sweepStale(floor: Long, key: Long): Unit =
    AllTables.foreach { table =>
      partitionIds(table)
        .filter(id => id >= 0 && (id > floor || id == key))
        .foreach(id =>
          fs.delete(new Path(tableDir(table), s"batch_id=$id"), true))
    }

  /** Stamp the batch-level commit record on `key`'s partition, recording
    * the batch's full participant list (see [[committedFloor]]). An empty
    * batch gets a marker-only directory: underscore files are invisible
    * to Spark's readers (zero rows), but the marker keeps this table's
    * watermark in lock-step with its co-participants'. The up-front
    * [[sweepStale]] guarantees a data-bearing dir here is this write's
    * product, never stale content. */
  private def markCommitted(table: String, key: Long,
      participants: Seq[String]): Unit = {
    val pdir = new Path(tableDir(table), s"batch_id=$key")
    if (!fs.exists(pdir)) fs.mkdirs(pdir)
    val out = fs.create(markerPath(table, key), true)
    out.write(participants.mkString(",").getBytes("UTF-8"))
    out.close()
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
    // Derive the floor from validated batch commit records instead
    // ([[committedFloor]]): a batch is committed only when every table it
    // NAMES carries its marker, so a crash anywhere mid-batch (data
    // writes or marker stamps) leaves it above the floor and it replays
    // in full, across tables — while a mode switch (a table no longer
    // being written) cannot drag the floor into committed history.
    val prev = state.load().map(_.height).getOrElse {
      committedFloor().getOrElse {
        // Legacy fallback: a table written before markers existed has data
        // but no markers — a MinValue floor would sweep ALL its committed
        // history. Fall back to the round-3 rule (max existing positive
        // id = committed). Residual known limitation: if the very first
        // marker-era batch crashes before any marker exists AND the
        // cursor is lost, this rule adopts the partial — unavoidable
        // without any commit record to consult.
        val existing = AllTables.flatMap(partitionIds).filter(_ >= 0)
        if (existing.isEmpty) Long.MinValue else existing.max
      }
    }
    sweepStale(prev, maxHeight)
    val participants =
      Seq("rewards") ++ out.transactions.map(_ => "transactions")
    writeBatch(out.rewards, "rewards", maxHeight)
    out.transactions.foreach(writeBatch(_, "transactions", maxHeight))
    // Batch-level commit record: stamped only once ALL tables' data for
    // this batch is on disk, then the cursor. A crash before any stamp
    // replays the whole batch; a crash between stamps leaves the batch
    // failing committedFloor's cross-table validation, so it replays too.
    participants.foreach(markCommitted(_, maxHeight, participants))
    state.advance(IngestState(maxHeight, firstBlock))
  }

  /** Canonical stored schema (data columns + the batch_id partition
    * column). Passing it explicitly to every read keeps a table whose
    * only partitions are marker-only dirs (legitimate: every batch so far
    * was empty for this table) readable — schema inference has no data
    * files to look at there and would throw. */
  private def storedSchema(table: String): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val base = table match {
      case "rewards" => org.apache.spark.sql.Encoders.product[Reward].schema
      case "transactions" =>
        org.apache.spark.sql.Encoders.product[TxnEnvelope].schema
    }
    StructType(base.fields.map(_.copy(nullable = true)) :+
      StructField("batch_id", LongType, nullable = true))
  }

  def rewardsTable(): DataFrame = {
    recover("rewards")
    spark.read.schema(storedSchema("rewards")).parquet(s"$root/rewards")
  }
  def transactionsTable(): DataFrame = {
    recover("transactions")
    spark.read.schema(storedSchema("transactions")).parquet(s"$root/transactions")
  }

  /** Compact closed batches: every positive `batch_id` partition except the
    * newest, plus all previous consolidated generations, is rewritten into
    * one NEW consolidated partition (`batch_id = -generation`, decreasing)
    * with `targetPartitions` files.
    *
    * Why safe: the cursor is monotonic and replay can only re-run the
    * batch *after* the stored cursor, i.e. at most the newest committed
    * batch — which compaction never touches. Only MARKED partitions are
    * consolidated (minus the newest marked, kept as both replay target
    * and floor evidence): an unmarked positive is crash junk pending
    * [[sweepStale]], and consolidating it would launder it into a
    * committed generation; consolidating the last marked one would erase
    * the marker evidence [[committedFloor]] depends on. Tables from
    * before the marker scheme (zero markers anywhere) keep the round-3
    * rule (all positives minus the newest). Why needed: a 10 s trigger
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
    val marked = markedIds(table).toSet
    val closed =
      if (marked.nonEmpty) ids.filter(marked.contains).sorted.dropRight(1)
      else ids.filter(_ >= 0).sorted.dropRight(1) // legacy, pre-marker table
    if (closed.isEmpty) return
    val gens = ids.filter(_ < 0)
    val newGen = (gens :+ 0L).min - 1
    val sources = closed ++ gens

    val tmp = tmpDir(table)
    fs.delete(tmp, true) // a tmp without manifest is a dead write
    val keep = sources.map(x => x: Any)
    spark.read.schema(storedSchema(table)).parquet(s"$root/$table")
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
