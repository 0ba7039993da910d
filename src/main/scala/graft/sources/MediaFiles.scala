package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Media

/** Asset-file ingestion — [[Jsonl]]'s media twin. Crawled media
  * arrives as FILES in a drop directory (one per fetched asset), not
  * as rows; Spark's `binaryFile` source reads them distributed
  * (payload bytes never touch the driver) and this maps them onto
  * [[graft.multimodal.Media.MediaRecord]], the shape every media
  * stage (m-queries, m12 nights, the store bridge) consumes.
  *
  * Contract per file:
  *  - `kind` from the extension (png/jpg/jpeg/gif/bmp → image,
  *    wav/aiff/aif → audio, avi → video); unknown extensions are
  *    FILTERED — the decode arms own only these containers
  *    (the documented pure-JVM codec ceiling), and an unreadable blob
  *    must not reach them;
  *  - `media_id` is the 60-bit hash of the file NAME: deterministic,
  *    so a checkpoint replay or re-drop of the same fetch file folds
  *    identically through the night ledger. A re-crawl of the same
  *    BYTES under a new name gets a new id and is judged `exact` by
  *    the index — the dedup path, not the id path, owns content
  *    identity;
  *  - `source` is the asset's parent directory name — crawlers that
  *    shard drops by host get per-source accounting for free.
  *
  * Scale notes: `binaryFile` ships one row per file with the payload
  * as a column — right for crawl assets (KB–MB), wrong for GB video
  * masters (chunk those upstream, m05's chunked-payload path).
  * `maxFilesPerTrigger` bounds a backlog catch-up to night-sized
  * micro-batches. */
object MediaFiles {

  private val KindOf = Map(
    "png" -> "image", "jpg" -> "image", "jpeg" -> "image",
    "gif" -> "image", "bmp" -> "image",
    "wav" -> "audio", "aiff" -> "audio", "aif" -> "audio",
    "avi" -> "video")

  private def shaped(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val name = element_at(split(col("path"), "/"), -1)
    val ext = lower(element_at(split(name, "\\."), -1))
    val kind = KindOf.foldLeft(lit(null: String)) {
      case (acc, (e, k)) => when(ext === e, k).otherwise(acc)
    }
    df.select(
      // the FULL path, not the basename: two hosts dropping
      // "img1.png" must not share an id (duplicate media_ids would
      // collide in the corpus join and the index's winner naming)
      graft.functions.Portable.hash60(col("path"), 9341).as("media_id"),
      kind.as("kind"),
      col("content").as("payload"),
      element_at(split(col("path"), "/"), -2).as("source"))
      .filter(col("kind").isNotNull && col("payload").isNotNull &&
        length(col("payload")) > 0)
  }

  /** Batch read of a drop directory (recursive). */
  def media(s: SparkSession, dir: String): Dataset[Media.MediaRecord] = {
    import s.implicits._
    shaped(s.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(dir))
      .as[Media.MediaRecord]
  }

  /** The always-on twin: watch the drop directory and serve each
    * fetched asset as a media record —
    * `StoreMediaDedup.ingestNights(streamMedia(...), ...)` turns every
    * micro-batch into a committed payload-corpus night + fingerprint
    * fold with no batch scheduler. */
  def streamMedia(s: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 8): Dataset[Media.MediaRecord] = {
    import s.implicits._
    // file stream sources want the schema declared; binaryFile's is
    // fixed by the format
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    shaped(s.readStream.format("binaryFile")
      .schema(schema)
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir))
      .as[Media.MediaRecord]
  }
}
