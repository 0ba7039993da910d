package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL crawl-dump ingestion — the upstream face of the documents
  * pipeline. Crawl corpora arrive as JSON Lines (one document object
  * per line), not parquet; this maps them onto the exact
  * `(doc_id, text, lang, source, n_chars)` shape every downstream
  * stage (p01/p04, the nightly CLI, the dedup indexes) expects, with
  * the malformed tail captured instead of silently dropped.
  *
  * Contract per line:
  *  - `text` (string, required): a line without non-empty text is a
  *    REJECT, not an empty document — a crawl bug must surface in the
  *    reject channel, not as a 0-token doc skewing quality stats;
  *  - `doc_id` (long, optional): synthesized deterministically from
  *    (source, text) when absent — a re-read of the same dump yields
  *    the same ids, so reruns stay idempotent through the night
  *    ledger. Content-derived ids give byte-identical re-crawls the
  *    SAME id, which the dedup index treats as a self-match (benign);
  *    prefer real upstream ids when the crawler has them;
  *  - `lang` (optional, default "und"), `source` (optional, default
  *    "unknown"); `n_chars` is always derived from the text.
  *
  * Scale notes: the schema is EXPLICIT (no sampling pass over 100 TB
  * of JSON to infer it); the read is one pass in PERMISSIVE mode with
  * the corrupt line captured per-row, so clean docs and rejects come
  * from the same scan definition (two actions = two scans — at dump
  * scale run [[documents]] and [[rejects]] as separate jobs rather
  * than caching). Prefer a splittable compression for the dump files
  * (zstd/bzip2/none): a single 100 GB .gz file is one task forever.
  *
  * Reference contract: this is the same "source rows → typed columns,
  * invalid input fails loudly" discipline as the reference's enum
  * cast (src/transaction.rs:9) and checked narrowing
  * (src/reward.rs:35-36), applied at the corpus boundary. */
object Jsonl {

  /** The raw-line schema: typed fields plus the corrupt-line capture
    * column (PERMISSIVE puts the whole malformed line there). */
  private val Corrupt = "_corrupt_record"
  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField(Corrupt, StringType)))

  private def raw(s: SparkSession, path: String): DataFrame =
    s.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)

  /** A line is clean iff it parsed AND carries non-empty text. */
  private def clean: Column =
    col(Corrupt).isNull && col("text").isNotNull &&
      length(trim(col("text"))) > 0

  /** The deterministic id for id-less lines: a 60-bit hash of the
    * separator-joined (source, text) pair — engine-portable and
    * rerun-stable. The control-char separator keeps the pair
    * injective: bare concatenation would hash ("web","x") and
    * ("we","bx") identically. */
  private def synthId: Column =
    graft.functions.Portable.hash60(
      concat_ws("\u0001", coalesce(col("source"), lit("unknown")),
        col("text")), 7177)

  /** The documents-shaped clean read of a JSONL dump. */
  def documents(s: SparkSession, path: String): DataFrame =
    raw(s, path)
      .filter(clean)
      .select(
        coalesce(col("doc_id"), synthId).as("doc_id"),
        col("text"),
        coalesce(col("lang"), lit("und")).as("lang"),
        coalesce(col("source"), lit("unknown")).as("source"),
        length(col("text")).cast("long").as("n_chars"))

  /** The reject channel: every line [[documents]] did not admit, with
    * the raw line where parsing failed (null for the parsed-but-
    * textless shape) and a reason tag — the quarantine sink a crawl
    * operator actually debugs from. */
  def rejects(s: SparkSession, path: String): DataFrame =
    raw(s, path)
      .filter(!clean)
      .select(
        col(Corrupt).as("raw_line"),
        when(col(Corrupt).isNotNull, "malformed_json")
          .otherwise("empty_text").as("reason"))

  /** The always-on twin: watch a drop DIRECTORY for JSONL files and
    * serve clean lines as the ingest stream the store bridges consume
    * — a crawler drops one file per fetch batch, and
    * `StoreDedup.ingestNights(streamDocuments(...), ...)` turns each
    * micro-batch into a committed corpus night + index fold with no
    * batch scheduler at all. Same schema/clean/id contract as
    * [[documents]]; rejected lines are FILTERED here (a streaming
    * query has one sink — run [[rejects]] as a periodic batch job
    * over the same directory for the quarantine channel, which its
    * one-pass shape makes cheap). `maxFilesPerTrigger` bounds a
    * backlog catch-up to corpus-night-sized micro-batches instead of
    * one giant replay batch. */
  def streamDocuments(s: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 8)
      : org.apache.spark.sql.Dataset[graft.streaming.StoreDedup.IngestDoc] = {
    import s.implicits._
    s.readStream
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)
      .filter(clean)
      .select(
        coalesce(col("doc_id"), synthId).as("doc_id"),
        coalesce(col("source"), lit("unknown")).as("source"),
        col("text"))
      .as[graft.streaming.StoreDedup.IngestDoc]
  }
}
