package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation-versioned parquet index store — the lifecycle layer under
  * the delta-dedup indexes (d24's signature index, m12's media
  * fingerprint index, [[graft.queries.TextDedupOps]] /
  * [[graft.queries.MultimodalOps]]).
  *
  * The nightly contract those operators document — "today's run dedups
  * against yesterday's corpus" — needs the index to ADVANCE: each
  * night's admitted uniques must be part of the next night's index.
  * In-place append to a serving parquet dir is not an option (a reader
  * mid-append sees a torn file listing), so generations: the root holds
  * `gen=<n>/` subdirectories, each one immutable once committed, and a
  * `_COMMITTED` marker stamped only AFTER a generation's parquet write
  * fully succeeds — the write-new-then-mark discipline of
  * [[graft.helium.ExactlyOnceSink]]'s compaction. Readers resolve the
  * live generation as max-committed-n, so a torn advance (parquet
  * half-written, marker absent) is invisible and the previous
  * generation keeps serving; re-running the failed advance overwrites
  * the unmarked dir. An advance never modifies any earlier generation's
  * files (DeltaAdvanceSpec pins this byte-for-byte).
  *
  * Single-writer by design, like the nightly jobs it serves: one
  * build/advance at a time per root; concurrent readers are always
  * safe. [[prune]] is the separate compaction face — advances stay
  * additive-only so the "old generations untouched" invariant is
  * auditable.
  *
  * 100 TB: generations hold the distilled index rows (~40 B/doc — the
  * signature/fingerprint tables, never text or payloads), so a full
  * rewrite per advance is |index| I/O, not |corpus|; when even that is
  * too much, the layout already supports the standard LSM refinement
  * (write the delta as its own generation and read the union of all
  * committed generations) without changing readers' contract — max
  * committed n stays the newest TOTAL index here precisely so that
  * swap stays atomic. */
object IndexGenerations {

  private val Marker = "_COMMITTED"

  private def fsOf(s: SparkSession, root: String) =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def genPath(root: String, n: Long) = new Path(root, s"gen=$n")

  /** Committed generation numbers under `root`, ascending. Directories
    * without the marker are torn writes — ignored. */
  def committed(s: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(s, root)
    val rp = new Path(root)
    if (!fs.exists(rp)) Seq.empty
    else fs.listStatus(rp).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case g if g.startsWith("gen=") => g.drop(4).toLong }
      .filter(n => fs.exists(new Path(genPath(root, n), Marker)))
      .sorted
  }

  /** The live (max committed) generation, if any. */
  def currentGen(s: SparkSession, root: String): Option[Long] =
    committed(s, root).lastOption

  /** Read the live generation. */
  def readCurrent(s: SparkSession, root: String): DataFrame = {
    val n = currentGen(s, root).getOrElse(throw new IllegalStateException(
      s"no committed index generation under $root — build the index first"))
    s.read.parquet(genPath(root, n).toString)
  }

  private def write(s: SparkSession, root: String, n: Long,
      df: DataFrame): Long = {
    val dir = genPath(root, n)
    df.write.mode("overwrite").parquet(dir.toString)
    fsOf(s, root).create(new Path(dir, Marker), true).close()
    n
  }

  /** (Re)initialize: wipe every existing generation and write `df` as
    * generation 0 — the build-mode face, idempotent across reruns. */
  def reset(s: SparkSession, root: String, df: DataFrame): Long = {
    val fs = fsOf(s, root)
    val rp = new Path(root)
    if (fs.exists(rp))
      fs.listStatus(rp)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
        .foreach(st => fs.delete(st.getPath, true))
    write(s, root, 0L, df)
  }

  /** Fold `additions` into the next generation: read live generation N,
    * union by name, write generation N+1, stamp its marker last.
    * Generation N's files are never touched — a reader mid-advance keeps
    * serving N, and a crash before the marker leaves N live. Returns the
    * new generation number. */
  def advance(s: SparkSession, root: String, additions: DataFrame): Long = {
    val n = currentGen(s, root).getOrElse(throw new IllegalStateException(
      s"advance needs a committed base generation under $root"))
    val cur = s.read.parquet(genPath(root, n).toString)
    write(s, root, n + 1, cur.unionByName(additions))
  }

  /** Delete every generation directory except the live one — committed
    * ancestors and torn leftovers alike. Run between advances (single
    * writer), never concurrently with one. */
  def prune(s: SparkSession, root: String): Unit = {
    val live = currentGen(s, root)
    val fs = fsOf(s, root)
    val rp = new Path(root)
    if (fs.exists(rp))
      fs.listStatus(rp)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
        .filter(st => !live.map(genPath(root, _).getName)
          .contains(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, true))
  }
}
