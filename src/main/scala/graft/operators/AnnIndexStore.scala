package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized ANN index — the offline-build / online-serve split an
  * IVFADC deployment actually runs: the four index tables
  * ([[graft.queries.SimilarityOps.buildAnnIndex]] — coarse centroids,
  * PQ codebook, inverted lists, per-candidate code words) written as
  * parquet, read back by a serving job that never re-derives them.
  * Everything the serving path needs beyond these tables is the query
  * vectors and the full vectors for the shortlist re-rank.
  *
  * At 100 TB the proportions matter: centroids and codebook are
  * broadcast-sized, lists and codes are ~9 narrow rows per candidate —
  * the index is a small multiple of an id column, NOT of the vectors,
  * which is the whole point of PQ. Serving from the store is
  * spec-asserted bit-identical to serving the in-memory build
  * (AnnRefinementSpec), in both seed and refined centroid modes.
  *
  * The four tables commit ATOMICALLY: they land in one
  * [[IndexGenerations]] multi-table generation whose single marker
  * stamps after all four parquet writes — a crash between table writes
  * can never leave a reader with this retrain's centroids next to last
  * retrain's codes (the classic torn-multi-table hole of a plain
  * four-directory overwrite). Each retrain/append lands as a new
  * generation; readers serve the newest committed one, and
  * [[IndexGenerations.prune]] reclaims the superseded. */
object AnnIndexStore {

  val Tables: Seq[String] = Seq("centroids", "codebook", "lists", "codes")

  def write(index: Map[String, DataFrame], path: String): Unit = {
    val s = index(Tables.head).sparkSession
    IndexGenerations.writeTables(s, path, Tables.map(t => t -> index(t)).toMap)
  }

  /** Serve the newest committed generation; a store written in the
    * pre-generation FLAT layout (four sibling table dirs under `path`,
    * no `gen=N`) stays readable — the [[graft.streaming.StreamTokenizer]]
    * `loadMerges` fallback, mirrored here so a serve-mode deployment
    * (`buildIndex=false`, artifact shipped by an older build) survives
    * the upgrade without a rebuild. The next [[write]] lands as
    * generation 0 beside the flat dirs and takes over. */
  def read(spark: SparkSession, path: String): Map[String, DataFrame] =
    if (IndexGenerations.currentGen(spark, path).isEmpty &&
        flatLayoutExists(spark, path))
      Tables.map(t => t -> spark.read.parquet(s"$path/$t")).toMap
    else IndexGenerations.readTables(spark, path, Tables)

  private def flatLayoutExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, Tables.head)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
