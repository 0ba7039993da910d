package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, KeyValueGroupedDataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.multimodal.Media
import graft.operators.IndexGenerations

/** [[StoreDedup]]'s media twin — the junction between the media ingest
  * stream ([[IncrementalDedup.detectFpDups]]' world) and the nightly
  * m12 loop (`MultimodalOps.m12Advance` over the generation store).
  * Identical architecture, media fingerprints instead of signatures:
  *
  *  1. BOOTSTRAP — a fresh deployment seeds bucket state from the m12
  *     index's live generation (kind + byte checksum + perceptual
  *     aHash60, ~50 B/asset — payloads never enter state);
  *  2. FOLD — each micro-batch's asset-level admitted uniques advance
  *     the store under the same recorded exactly-once discipline, so
  *     tonight's `m12Advance` judges a re-upload of any
  *     stream-admitted asset `exact`.
  *
  * Fingerprint math is batch m12's own: [[Media.checksumOf]] (the m06
  * byte-checksum formula) and [[Media.imagePHashOf]] (the m07 decode +
  * aHash60), computed in one `mapPartitions` decode — payloads never
  * shuffle. Banding: m07's 5×12 pigeonhole buckets over the phash
  * (exact for hamming ≤ 4) plus an exact-arm bucket on
  * `(kind, checksum)`, mirroring [[StoreDedup]]'s `h:` arm. The
  * event-time TTL face composes exactly as [[StoreDedup.ingestTimed]]
  * (same step body, same eviction contract) for crawls that need a
  * bounded horizon. */
object StoreMediaDedup {

  case class Fp(media_id: Long, kind: String, checksum: String, phash: Long)
  case class BandedFp(bucket: String, media_id: Long, kind: String,
      checksum: String, phash: Long)
  case class Entry(media_id: Long, kind: String, checksum: String,
      phash: Long)

  /** Per-bucket admission outcome ([[StoreDedup.Admission]]'s shape);
    * asset-level uniqueness = no non-`unique` row for the media_id. */
  case class FpAdmission(media_id: Long, kind: String, checksum: String,
      phash: Long, bucket: String, verdict: String, winner: Long)

  private val MaxHamming = 4L

  /** The one decode pass: checksum + perceptual hash per crawled
    * payload, batch m12's formulas verbatim — the checksum is of the
    * 64-byte RESIZE (what m12Fingerprints stores), the phash of the
    * raw payload (what perceptualHashes hashes). */
  def fingerprints(media: Dataset[Media.MediaRecord]): Dataset[Fp] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(it => it.map(r =>
      Fp(r.media_id, r.kind,
        Media.checksumOf(Media.resizePayload(r.payload, 64)),
        Media.imagePHashOf(r.payload))))
  }

  /** m07's 5×12 pigeonhole banding (`p:<band·4096+nib>`) plus the
    * exact-arm bucket (`x:<kind>:<checksum>`) — disjoint prefixes, so
    * a byte-identical re-upload collides even when its perceptual
    * banding would not need to. */
  def bandFps(fps: Dataset[Fp]): Dataset[BandedFp] = {
    val spark = fps.sparkSession
    import spark.implicits._
    bandFpsDf(fps.toDF()).as[BandedFp]
  }

  private def bandFpsDf(fps: DataFrame): DataFrame = {
    val cols = Seq("media_id", "kind", "checksum", "phash").map(col)
    val pigeon = fps.select(
      explode(array((0 until 5).map(b =>
        concat(lit("p:"), (lit(b.toLong * 4096L) +
          shiftright(col("phash"), b * 12).bitwiseAND(lit(0xFFFL)))
          .cast("string"))): _*)).as("bucket") +: cols: _*)
    val exact = fps.select(
      concat(lit("x:"), col("kind"), lit(":"), col("checksum"))
        .as("bucket") +: cols: _*)
    pigeon.unionByName(exact)
  }

  /** Band the live m12 index into first-start initial state. */
  def initialStateFrom(spark: SparkSession, indexDir: String)
      : KeyValueGroupedDataset[String, List[Entry]] = {
    import spark.implicits._
    bandFpsDf(IndexGenerations.readCurrent(spark, indexDir))
      .groupBy(col("bucket"))
      .agg(collect_list(struct(col("media_id"), col("kind"),
        col("checksum"), col("phash"))).as("entries"))
      .select(col("bucket").as("_1"), col("entries").as("_2"))
      .as[(String, List[Entry])]
      .groupByKey(_._1)
      .mapValues(_._2)
  }

  /** Exact first (kind + checksum), then perceptual (hamming ≤ 4);
    * min-id winners — m12's verdict discipline at ingest cadence. */
  private def step(rows: Seq[BandedFp], admitted0: List[Entry])
      : (List[Entry], List[FpAdmission]) = {
    var admitted = admitted0
    val out = scala.collection.mutable.ListBuffer.empty[FpAdmission]
    rows.sortBy(_.media_id).foreach { r =>
      def emit(verdict: String, winner: Long): Unit =
        out += FpAdmission(r.media_id, r.kind, r.checksum, r.phash,
          r.bucket, verdict, winner)
      val exact = admitted.iterator
        .filter(e => e.kind == r.kind && e.checksum == r.checksum)
        .map(_.media_id).minOption
      lazy val near = admitted.iterator
        .filter(e =>
          java.lang.Long.bitCount(e.phash ^ r.phash) <= MaxHamming)
        .map(_.media_id).minOption
      exact match {
        case Some(w) => emit("exact", w)
        case None => near match {
          case Some(w) => emit("near", w)
          case None =>
            admitted = Entry(r.media_id, r.kind, r.checksum, r.phash) ::
              admitted
            emit("unique", -1L)
        }
      }
    }
    (admitted, out.toList)
  }

  /** The store-bootstrapped media detector ([[StoreDedup.admitAll]]'s
    * twin). */
  def admitAll(banded: Dataset[BandedFp],
      initial: KeyValueGroupedDataset[String, List[Entry]])
      : Dataset[FpAdmission] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[Entry], FpAdmission](
        OutputMode.Append(), GroupStateTimeout.NoTimeout(), initial) {
        (_: String, rows: Iterator[BandedFp],
         state: GroupState[List[Entry]]) =>
          val (admitted, out) = step(rows.toSeq,
            state.getOption.getOrElse(Nil))
          state.update(admitted)
          out.iterator
      }
  }

  /** Fold one micro-batch's asset-level uniques into the m12 store —
    * [[StoreDedup.foldBatch]]'s discipline (recorded advance, replay
    * skip, intra-batch dedup via `MultimodalOps.intraUniqueFps`, the
    * optional per-batch index anti-join on kind+checksum). */
  def foldBatch(s: SparkSession, indexDir: String, admissions: DataFrame,
      streamId: String, batchId: Long): Boolean = {
    val prefix = streamId + ":"
    val done = IndexGenerations.records(s, indexDir, StoreDedup.RecordName)
      .collect { case r if r.startsWith(prefix) =>
        r.stripPrefix(prefix).toLong }
    if (done.nonEmpty && done.max >= batchId) false
    else {
      val dupIds = admissions.filter(col("verdict") =!= "unique")
        .select("media_id").distinct()
      val uniques0 = admissions
        .dropDuplicates("media_id")
        .join(dupIds, Seq("media_id"), "left_anti")
        .select("media_id", "kind", "checksum", "phash")
      val uniques =
        if (s.conf.getOption("spark.graft.stream.indexCheck")
            .exists(_.toBoolean))
          uniques0.join(IndexGenerations.readCurrent(s, indexDir)
            .select("kind", "checksum"), Seq("kind", "checksum"),
            "left_anti")
            .select("media_id", "kind", "checksum", "phash")
        else uniques0
      IndexGenerations.advanceByConfRecorded(s, indexDir,
        graft.queries.MultimodalOps.intraUniqueFps(uniques),
        Some(StoreDedup.RecordName -> (prefix + batchId)))
      true
    }
  }

  /** Assemble and start the store-backed media ingest: decode → band →
    * bootstrap from the m12 index → admit → fold each batch's uniques
    * back. The index must have a committed base generation
    * (`MultimodalOps.m12Build`). */
  def ingest(media: Dataset[Media.MediaRecord], indexDir: String,
      checkpointDir: String): StreamingQuery = {
    val spark = media.sparkSession
    admitAll(bandFps(fingerprints(media)),
      initialStateFrom(spark, indexDir))
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[FpAdmission], batchId: Long) =>
        foldBatch(batch.sparkSession, indexDir, batch.toDF(),
          checkpointDir, batchId)
        ()
      }
      .start()
  }
}
