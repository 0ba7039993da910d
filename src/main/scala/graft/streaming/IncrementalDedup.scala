package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{MinHashAgg, TextFns}

/** Streaming incremental near-duplicate detection — the stateful-streaming
  * face of the dedup suite (SURVEY §2.8 last row:
  * `flatMapGroupsWithState`), shaped for a training-data ingest pipeline:
  * documents arrive continuously; each is admitted iff its MinHash
  * signature does not collide with any signature already admitted in its
  * LSH band-bucket.
  *
  * State is keyed by band bucket (not by document), so lookups touch only
  * the colliding bucket's signatures — the streaming analogue of d03's
  * band join. State per key is the admitted signatures in that bucket.
  * [[detect]] keeps state forever (exact within the stream's lifetime);
  * [[detectWithTtl]] bounds memory with an event-time TTL — a bucket idle
  * longer than the TTL (relative to the watermark) drops its signatures,
  * so state is bounded by the docs admitted within one TTL horizon, the
  * same contract as `dropDuplicatesWithinWatermark`.
  */
object IncrementalDedup {

  case class Doc(doc_id: Long, text: String)
  case class Banded(bucket: String, doc_id: Long, sig: Seq[Long])
  case class Verdict(doc_id: Long, bucket: String, duplicateOf: Long)
  case class TimedDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)
  case class TimedBanded(bucket: String, doc_id: Long, sig: Seq[Long],
      ts: java.sql.Timestamp)

  val K = 3
  val MINHASH_K = 12
  val BANDS = 4
  private val ROWS = MINHASH_K / BANDS

  /** Per-batch signature+banding plan (same math as d03, so batch and
    * streaming dedup agree). */
  def band(docs: Dataset[Doc]): Dataset[Banded] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.HashSketch.register(spark)
    docs.toDF()
      .withColumn("th", TextFns.tokenHashSeq(col("text")))
      .withColumn("hs", array_distinct(
        graft.functions.HashSketch.shingleSeq(col("th"), K)))
      .filter(size(col("hs")) > 0)
      .withColumn("sig",
        graft.functions.HashSketch.minhashSig(col("hs"), MINHASH_K))
      .select(col("doc_id"), col("sig"),
        explode(array((0 until BANDS).map(b =>
          TextFns.bandKey(col("sig"), b, ROWS)): _*)).as("bucket"))
      .select(col("bucket"), col("doc_id"), col("sig"))
      .as[Banded]
  }

  /** Event-time banding: same signature math as [[band]] plus the event
    * timestamp and a watermark, feeding [[detectWithTtl]]. */
  def bandTimed(docs: Dataset[TimedDoc],
      watermarkDelay: String = "0 seconds"): Dataset[TimedBanded] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.HashSketch.register(spark)
    docs.toDF()
      .withWatermark("ts", watermarkDelay)
      .withColumn("th", TextFns.tokenHashSeq(col("text")))
      .withColumn("hs", array_distinct(
        graft.functions.HashSketch.shingleSeq(col("th"), K)))
      .filter(size(col("hs")) > 0)
      .withColumn("sig",
        graft.functions.HashSketch.minhashSig(col("hs"), MINHASH_K))
      .select(col("doc_id"), col("sig"), col("ts"),
        explode(array((0 until BANDS).map(b =>
          TextFns.bandKey(col("sig"), b, ROWS)): _*)).as("bucket"))
      .select(col("bucket"), col("doc_id"), col("sig"), col("ts"))
      .as[TimedBanded]
  }

  /** [[detect]] with bounded state: each batch re-arms the bucket's
    * event-time timeout to (max event time seen) + `ttl`; once the
    * watermark passes that, the bucket's admitted signatures are dropped.
    * Documents re-arriving after the horizon are admitted as fresh — the
    * deliberate trade that keeps state finite on an unbounded stream. */
  def detectWithTtl(banded: Dataset[TimedBanded],
      ttlMs: Long, threshPm: Long = 500): Dataset[Verdict] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Seq[Long])], Verdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bucket: String, rows: Iterator[TimedBanded],
         state: GroupState[List[(Long, Seq[Long])]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var admitted = state.getOption.getOrElse(Nil)
            val out = scala.collection.mutable.ListBuffer.empty[Verdict]
            var maxTs = Long.MinValue
            rows.toSeq.sortBy(_.doc_id).foreach { r =>
              maxTs = math.max(maxTs, r.ts.getTime)
              admitted.find { case (_, sig) =>
                MinHashAgg.estimateJaccardPm(sig, r.sig) >= threshPm
              } match {
                case Some((origId, _)) =>
                  out += Verdict(r.doc_id, bucket, origId)
                case None =>
                  admitted = (r.doc_id, r.sig) :: admitted
              }
            }
            state.update(admitted)
            // must arm strictly past the current watermark or Spark throws
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  case class VecDoc(vec_id: Long, embedding: Seq[Float])
  case class VecBanded(bucket: Long, vec_id: Long, qv: Seq[Long])
  case class VecVerdict(bucket: Long, vec_id: Long, duplicateOf: Long,
      cosMilli: Long)

  /** Embedding-side banding: quantize, compute the four 4-bit hyperplane
    * table signatures (same fused [[graft.functions.HashSketch.lshSig]]
    * as batch s02), one bucket row per table. Streaming semantic dedup =
    * s07's pair detection in incremental form. */
  def bandVectors(docs: Dataset[VecDoc]): Dataset[VecBanded] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.HashSketch.register(spark)
    docs.toDF()
      .withColumn("qv", graft.functions.VectorFns.qvec(col("embedding")))
      .select(col("vec_id"), col("qv"),
        explode(array((0 until BANDS).map(t =>
          (lit(t.toLong * 16) +
            graft.functions.HashSketch.lshSig(col("qv"), 4, t * 4))
            .as("bucket")): _*)).as("bucket"))
      .select(col("bucket"), col("vec_id"), col("qv"))
      .as[VecBanded]
  }

  /** Admit a vector iff no previously-admitted vector in any shared LSH
    * bucket has cosine ≥ `cosMilliThresh`/1000 with it (exact cosine on
    * the quantized grid verifies every bucket collision — LSH only
    * prunes). Verdicts are PER BUCKET (the [[Verdict]] contract): a
    * vector colliding in several band tables emits one row per table,
    * possibly naming different admitted predecessors — consumers
    * counting duplicates dedupe on vec_id
    * (`dropDuplicates("vec_id")`). */
  private def cosMilli(a: Seq[Long], b: Seq[Long]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1 }
    if (na == 0 || nb == 0) 0L
    else math.round(1000.0 * dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** One micro-batch of vector admissions against a bucket's state — the
    * ONE decision body both [[detectVecDups]] and [[detectVecDupsWithTtl]]
    * run, so the timed and untimed variants cannot drift. */
  private def vecStep(bucket: Long, rows: Seq[VecBanded],
      admitted0: List[(Long, Seq[Long])], cosMilliThresh: Long)
      : (List[(Long, Seq[Long])], List[VecVerdict]) = {
    var admitted = admitted0
    val out = scala.collection.mutable.ListBuffer.empty[VecVerdict]
    rows.sortBy(_.vec_id).foreach { r =>
      admitted.iterator
        .map { case (origId, qv) => (origId, cosMilli(qv, r.qv)) }
        .find(_._2 >= cosMilliThresh) match {
        case Some((origId, cm)) =>
          out += VecVerdict(bucket, r.vec_id, origId, cm)
        case None =>
          admitted = (r.vec_id, r.qv) :: admitted
      }
    }
    (admitted, out.toList)
  }

  def detectVecDups(banded: Dataset[VecBanded], cosMilliThresh: Long = 950)
      : Dataset[VecVerdict] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Seq[Long])], VecVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bucket: Long, rows: Iterator[VecBanded],
         state: GroupState[List[(Long, Seq[Long])]]) =>
          val (admitted, out) = vecStep(bucket, rows.toSeq,
            state.getOption.getOrElse(Nil), cosMilliThresh)
          state.update(admitted)
          out.iterator
      }
  }

  case class TimedVecDoc(vec_id: Long, embedding: Seq[Float],
      ts: java.sql.Timestamp)
  case class TimedVecBanded(bucket: Long, vec_id: Long, qv: Seq[Long],
      ts: java.sql.Timestamp)

  /** [[bandVectors]] with event time + watermark, feeding
    * [[detectVecDupsWithTtl]]. */
  def bandVectorsTimed(docs: Dataset[TimedVecDoc],
      watermarkDelay: String = "0 seconds"): Dataset[TimedVecBanded] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.HashSketch.register(spark)
    docs.toDF()
      .withWatermark("ts", watermarkDelay)
      .withColumn("qv", graft.functions.VectorFns.qvec(col("embedding")))
      .select(col("vec_id"), col("qv"), col("ts"),
        explode(array((0 until BANDS).map(t =>
          (lit(t.toLong * 16) +
            graft.functions.HashSketch.lshSig(col("qv"), 4, t * 4))
            .as("bucket")): _*)).as("bucket"))
      .select(col("bucket"), col("vec_id"), col("qv"), col("ts"))
      .as[TimedVecBanded]
  }

  /** [[detectVecDups]] with [[detectWithTtl]]'s bounded-state contract:
    * a bucket idle past `ttlMs` of event time drops its admitted
    * vectors; re-arrivals after the horizon are admitted fresh. */
  def detectVecDupsWithTtl(banded: Dataset[TimedVecBanded], ttlMs: Long,
      cosMilliThresh: Long = 950): Dataset[VecVerdict] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Seq[Long])], VecVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bucket: Long, rows: Iterator[TimedVecBanded],
         state: GroupState[List[(Long, Seq[Long])]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rs = rows.toSeq
            val maxTs = rs.iterator.map(_.ts.getTime).max
            val (admitted, out) = vecStep(bucket,
              rs.map(r => VecBanded(r.bucket, r.vec_id, r.qv)),
              state.getOption.getOrElse(Nil), cosMilliThresh)
            state.update(admitted)
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  case class FpBanded(bucket: Long, media_id: Long, phash: Long)
  case class FpVerdict(bucket: Long, media_id: Long, duplicateOf: Long,
      hamming: Long)

  /** Perceptual-fingerprint banding — m07's pigeonhole banding in
    * incremental form, the shape a live media crawl wants (near-dup
    * dedup AT INGEST TIME, where a re-encoded copy of an already-crawled
    * image must be caught before it is stored): each payload runs the
    * SAME real decode + aHash60 path as batch m07
    * ([[graft.multimodal.Media.perceptualHashes]] — ImageIO decode for
    * real images, byte-wrapped BMP otherwise), then one bucket row per
    * (band, 12-bit nib): bucket = band·4096 + nib, 5 bands over the
    * 60-bit hash. Only (bucket, id, 8-byte hash) rows leave the decode —
    * payloads and pixels never reach the shuffle or the state store. */
  def bandFingerprints(media: Dataset[graft.multimodal.Media.MediaRecord])
      : Dataset[FpBanded] = {
    val spark = media.sparkSession
    import spark.implicits._
    bandHashes60(graft.multimodal.Media.perceptualHashes(media).toDF()
      .select(col("media_id"), col("phash")))
  }

  /** [[bandFingerprints]]' audio sibling: the SAME real decode +
    * envHash60 path as batch m08, banded into the shared
    * [[detectFpDups]] state shape — acoustic near-dup dedup at ingest
    * (a bit-depth re-encode of an already-crawled clip is caught before
    * it is stored, where m06-style byte checksums cannot see it). */
  def bandAudioFingerprints(
      media: Dataset[graft.multimodal.Media.MediaRecord])
      : Dataset[FpBanded] = {
    val spark = media.sparkSession
    import spark.implicits._
    bandHashes60(graft.multimodal.Media.audioHashes(
        media.filter(col("kind") === "audio")).toDF()
      .select(col("media_id"), col("phash")))
  }

  /** The 5×12 pigeonhole banding over ANY 60-bit fingerprint column
    * (`media_id`, `phash`) — bucket = band·4096 + 12-bit nib, exact for
    * hamming ≤ 4 — shared by the image (aHash60) and audio (envHash60)
    * ingest paths: [[detectFpDups]] is hash-agnostic, so any modality
    * that fingerprints to 60 bits dedups through the same state shape. */
  private def bandHashes60(ph: DataFrame): Dataset[FpBanded] = {
    val spark = ph.sparkSession
    import spark.implicits._
    ph.select(col("media_id"), col("phash"),
        explode(array((0 until 5).map(b =>
          (lit(b.toLong * 4096L) + shiftright(col("phash"), b * 12)
            .bitwiseAND(lit(0xFFFL))).as("bucket")): _*)).as("bucket"))
      .select(col("bucket"), col("media_id"), col("phash"))
      .as[FpBanded]
  }

  /** Admit a payload iff no previously-admitted fingerprint within
    * hamming ≤ `maxHamming` shares a band-bucket with it. For the
    * default 4 the 5×12 banding is EXACT (any pair ≤ 4 differing bits
    * agrees on ≥ 1 clean band — the m07 pigeonhole), so a streamed
    * duplicate is flagged iff batch m07 would pair it with an admitted
    * predecessor (spec-asserted agreement on the same fixture stream).
    * State per bucket is the admitted (id, 8-byte hash) list — hashes,
    * never payloads — and bounds like [[detect]]'s signature state; an
    * event-time TTL composes exactly as [[detectWithTtl]] does for text
    * if the crawl needs a finite horizon. Verdicts are PER BUCKET (the
    * [[Verdict]] contract — an exact re-encode at hamming 0 collides in
    * all 5 bands and emits up to 5 rows, possibly naming different
    * admitted predecessors); consumers counting duplicates dedupe on
    * media_id (`dropDuplicates("media_id")`). */
  /** One micro-batch of fingerprint admissions — shared by
    * [[detectFpDups]] and [[detectFpDupsWithTtl]] (the [[vecStep]]
    * pattern: one decision body, two state-lifetime contracts). */
  private def fpStep(bucket: Long, rows: Seq[FpBanded],
      admitted0: List[(Long, Long)], maxHamming: Long)
      : (List[(Long, Long)], List[FpVerdict]) = {
    var admitted = admitted0
    val out = scala.collection.mutable.ListBuffer.empty[FpVerdict]
    rows.sortBy(_.media_id).foreach { r =>
      admitted.iterator
        .map { case (origId, ph) =>
          (origId, java.lang.Long.bitCount(ph ^ r.phash).toLong) }
        .find(_._2 <= maxHamming) match {
        case Some((origId, h)) =>
          out += FpVerdict(bucket, r.media_id, origId, h)
        case None =>
          admitted = (r.media_id, r.phash) :: admitted
      }
    }
    (admitted, out.toList)
  }

  def detectFpDups(banded: Dataset[FpBanded], maxHamming: Long = 4)
      : Dataset[FpVerdict] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Long)], FpVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bucket: Long, rows: Iterator[FpBanded],
         state: GroupState[List[(Long, Long)]]) =>
          val (admitted, out) = fpStep(bucket, rows.toSeq,
            state.getOption.getOrElse(Nil), maxHamming)
          state.update(admitted)
          out.iterator
      }
  }

  case class TimedFpBanded(bucket: Long, media_id: Long, phash: Long,
      ts: java.sql.Timestamp)

  /** A crawl record with its ingest event time — the timed face of
    * [[graft.multimodal.Media.MediaRecord]]. */
  case class TimedMediaRecord(media_id: Long, kind: String,
      payload: Array[Byte], source: String, ts: java.sql.Timestamp)

  /** [[bandFingerprints]] for a timed crawl: the SAME real decode +
    * aHash60 as batch m07 ([[graft.multimodal.Media.imagePHashOf]] —
    * one definition, no batch/stream drift), with the event time
    * carried through the decode so [[detectFpDupsWithTtl]] can evict on
    * the watermark. Payloads never leave the decode. */
  def bandFingerprintsTimed(media: Dataset[TimedMediaRecord],
      watermarkDelay: String = "0 seconds"): Dataset[TimedFpBanded] = {
    val spark = media.sparkSession
    import spark.implicits._
    bandHashes60Timed(
      media.mapPartitions(it => it.map(r =>
        (r.media_id, graft.multimodal.Media.imagePHashOf(r.payload), r.ts)))
        .toDF("media_id", "phash", "ts"),
      watermarkDelay)
  }

  /** [[bandAudioFingerprints]]' timed sibling — real WAV parse +
    * envHash60 ([[graft.multimodal.Media.audioEnvHashOf]]) with the
    * event time carried through. */
  def bandAudioFingerprintsTimed(media: Dataset[TimedMediaRecord],
      watermarkDelay: String = "0 seconds"): Dataset[TimedFpBanded] = {
    val spark = media.sparkSession
    import spark.implicits._
    bandHashes60Timed(
      media.filter(_.kind == "audio")
        .mapPartitions(it => it.map(r =>
          (r.media_id, graft.multimodal.Media.audioEnvHashOf(r.payload), r.ts)))
        .toDF("media_id", "phash", "ts"),
      watermarkDelay)
  }

  /** The [[bandHashes60]] banding over a timed (media_id, phash, ts)
    * frame — the image (aHash60) and audio (envHash60) ingest paths
    * attach the crawl timestamp to their decoded fingerprints and feed
    * the TTL-bounded detector through here. */
  def bandHashes60Timed(ph: DataFrame,
      watermarkDelay: String = "0 seconds"): Dataset[TimedFpBanded] = {
    val spark = ph.sparkSession
    import spark.implicits._
    ph.withWatermark("ts", watermarkDelay)
      .select(col("media_id"), col("phash"), col("ts"),
        explode(array((0 until 5).map(b =>
          (lit(b.toLong * 4096L) + shiftright(col("phash"), b * 12)
            .bitwiseAND(lit(0xFFFL))).as("bucket")): _*)).as("bucket"))
      .select(col("bucket"), col("media_id"), col("phash"), col("ts"))
      .as[TimedFpBanded]
  }

  /** [[detectFpDups]] with [[detectWithTtl]]'s bounded-state contract:
    * a fingerprint bucket idle past `ttlMs` of event time is dropped,
    * so a re-encode arriving after the horizon is admitted fresh —
    * state is bounded by one TTL horizon of distinct fingerprints. */
  def detectFpDupsWithTtl(banded: Dataset[TimedFpBanded], ttlMs: Long,
      maxHamming: Long = 4): Dataset[FpVerdict] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Long)], FpVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bucket: Long, rows: Iterator[TimedFpBanded],
         state: GroupState[List[(Long, Long)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rs = rows.toSeq
            val maxTs = rs.iterator.map(_.ts.getTime).max
            val (admitted, out) = fpStep(bucket,
              rs.map(r => FpBanded(r.bucket, r.media_id, r.phash)),
              state.getOption.getOrElse(Nil), maxHamming)
            state.update(admitted)
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  case class SpanChunk(chunk: String, doc_id: Long, idx: Int)
  case class SpanVerdict(doc_id: Long, idx: Int, keep: Boolean,
      firstDoc: Long)

  /** Per-batch span chunking — the same fixed-width extraction as batch
    * d21 (one formula, so batch and stream decisions agree): documents
    * split into consecutive `width`-token chunks, one row per chunk with
    * its in-doc position. */
  def chunkSpans(docs: Dataset[Doc], width: Int = 8): Dataset[SpanChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF()
      .withColumn("toks", TextFns.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, (size(toks) - 1) DIV $width),
             |  i -> array_join(slice(toks, i * $width + 1, $width), ' '))"""
            .stripMargin.replaceAll("\n", " ")))
          .as(Seq("idx", "chunk")))
      .select(col("chunk"), col("doc_id"), col("idx").cast("int").as("idx"))
      .as[SpanChunk]
  }

  /** Streaming span-level dedup — batch d21's C4 rule AT INGEST TIME:
    * a span is kept iff its content was never admitted before; later
    * occurrences (any document, any batch) are cut, each verdict naming
    * the first owner. State is keyed by span CONTENT (collision-free —
    * the key IS the span) and holds exactly the first (doc_id, idx) per
    * admitted span: the registry a streaming crawl checks before
    * storing text. Within a batch rows process in (doc_id, idx) order,
    * so for an in-order stream the decisions equal batch d21's
    * min-packed-key winner exactly (spec-asserted agreement). A
    * mega-repeated boilerplate span costs one state entry and O(batch
    * copies) work per batch — the skew lives in the per-batch group,
    * never accumulates. An event-time TTL composes as [[detectWithTtl]]
    * if the registry needs a finite horizon. */
  /** One micro-batch of span admissions — shared by [[detectSpanDups]]
    * and [[detectSpanDupsWithTtl]] (the [[vecStep]] pattern). */
  private def spanStep(rows: Seq[SpanChunk], first0: Option[(Long, Int)])
      : (Option[(Long, Int)], List[SpanVerdict]) = {
    val out = scala.collection.mutable.ListBuffer.empty[SpanVerdict]
    var first = first0
    rows.sortBy(r => (r.doc_id, r.idx)).foreach { r =>
      first match {
        case None =>
          first = Some((r.doc_id, r.idx))
          out += SpanVerdict(r.doc_id, r.idx, keep = true, r.doc_id)
        case Some((fd, _)) =>
          out += SpanVerdict(r.doc_id, r.idx, keep = false, fd)
      }
    }
    (first, out.toList)
  }

  def detectSpanDups(chunks: Dataset[SpanChunk]): Dataset[SpanVerdict] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks
      .groupByKey(_.chunk)
      .flatMapGroupsWithState[(Long, Int), SpanVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[SpanChunk],
         state: GroupState[(Long, Int)]) =>
          val (first, out) = spanStep(rows.toSeq, state.getOption)
          first.foreach(state.update)
          out.iterator
      }
  }

  /** Batch d23's k-gram anchors AT INGEST: one [[SpanChunk]] per token
    * position (idx = the 0-based offset), the chunk being the k-token
    * run starting there — every offset, not d21's aligned chunks.
    * Feeding these into the UNCHANGED span registry
    * ([[detectSpanDups]] / [[detectSpanDupsWithTtl]]) reproduces the
    * batch operator's decision exactly on an in-order stream: a cut
    * verdict at (doc, i) is precisely a d23 dup anchor (the gram was
    * admitted earlier — any doc, any batch), a kept verdict a
    * first-ever gram. Interval merging stays a consumer-side per-doc
    * fold over its own verdicts; the registry only owns the global
    * first-occurrence decision. State: one entry per distinct gram in
    * the horizon — ~k× denser than spans, so the TTL variant is the
    * production path on an unbounded crawl. */
  def gramSpans(docs: Dataset[Doc], k: Int = 8): Dataset[SpanChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF()
      .withColumn("toks", TextFns.tokens(col("text")))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, size(toks) - $k),
             |  i -> array_join(slice(toks, i + 1, $k), ' '))"""
            .stripMargin.replaceAll("\n", " ")))
          .as(Seq("idx", "chunk")))
      .select(col("chunk"), col("doc_id"), col("idx").cast("int").as("idx"))
      .as[SpanChunk]
  }

  /** [[gramSpans]] with event time + watermark, feeding
    * [[detectSpanDupsWithTtl]]. */
  def gramSpansTimed(docs: Dataset[TimedDoc], k: Int = 8,
      watermarkDelay: String = "0 seconds"): Dataset[TimedSpanChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF()
      .withWatermark("ts", watermarkDelay)
      .withColumn("toks", TextFns.tokens(col("text")))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), col("ts"),
        posexplode(expr(
          s"""transform(sequence(0, size(toks) - $k),
             |  i -> array_join(slice(toks, i + 1, $k), ' '))"""
            .stripMargin.replaceAll("\n", " ")))
          .as(Seq("idx", "chunk")))
      .select(col("chunk"), col("doc_id"),
        col("idx").cast("int").as("idx"), col("ts"))
      .as[TimedSpanChunk]
  }

  case class TimedSpanChunk(chunk: String, doc_id: Long, idx: Int,
      ts: java.sql.Timestamp)

  /** [[chunkSpans]] with event time + watermark, feeding
    * [[detectSpanDupsWithTtl]]. */
  def chunkSpansTimed(docs: Dataset[TimedDoc], width: Int = 8,
      watermarkDelay: String = "0 seconds"): Dataset[TimedSpanChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF()
      .withWatermark("ts", watermarkDelay)
      .withColumn("toks", TextFns.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("ts"),
        posexplode(expr(
          s"""transform(sequence(0, (size(toks) - 1) DIV $width),
             |  i -> array_join(slice(toks, i * $width + 1, $width), ' '))"""
            .stripMargin.replaceAll("\n", " ")))
          .as(Seq("idx", "chunk")))
      .select(col("chunk"), col("doc_id"),
        col("idx").cast("int").as("idx"), col("ts"))
      .as[TimedSpanChunk]
  }

  /** [[detectSpanDups]] with [[detectWithTtl]]'s bounded-state
    * contract: a span unseen for `ttlMs` of event time leaves the
    * registry, so the same content re-arriving after the horizon is
    * admitted (kept) again as a fresh first owner. The deliberate C4
    * relaxation that keeps the registry finite on an unbounded crawl:
    * state is one entry per DISTINCT span seen within the horizon. */
  def detectSpanDupsWithTtl(chunks: Dataset[TimedSpanChunk], ttlMs: Long)
      : Dataset[SpanVerdict] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks
      .groupByKey(_.chunk)
      .flatMapGroupsWithState[(Long, Int), SpanVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[TimedSpanChunk],
         state: GroupState[(Long, Int)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rs = rows.toSeq
            val maxTs = rs.iterator.map(_.ts.getTime).max
            val (first, out) = spanStep(
              rs.map(r => SpanChunk(r.chunk, r.doc_id, r.idx)),
              state.getOption)
            first.foreach(state.update)
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** m09's frame hashes banded into POSITION-QUALIFIED buckets for the
    * streaming prefilter: bucket = frame_idx · 20480 + band · 4096 +
    * nib, so only position-aligned frames ever share a bucket — the
    * m09 alignment rule. Runs the same real demux + aHash60 path as
    * batch ([[graft.multimodal.Media.frameHashes]]); only (bucket, id,
    * 8-byte hash) rows leave the decode. */
  def bandFrameFingerprints(
      media: Dataset[graft.multimodal.Media.MediaRecord],
      stride: Int = 4): Dataset[FpBanded] =
    bandFrameHashes(
      graft.multimodal.Media.frameHashes(media, stride).toDF())

  /** [[bandFrameFingerprints]] over the MJPEG-in-AVI codec path
    * ([[graft.multimodal.Media.mjpegFrameHashes]] — RIFF demux +
    * per-frame JPEG decode) — the ingest face of m11, sharing the exact
    * banding rule with the GIF arm so detector state is
    * codec-agnostic. */
  def bandFrameFingerprintsMjpeg(
      media: Dataset[graft.multimodal.Media.MediaRecord],
      stride: Int = 4): Dataset[FpBanded] =
    bandFrameHashes(
      graft.multimodal.Media.mjpegFrameHashes(media, stride).toDF())

  /** The shared position-qualified banding over a (media_id, frame_idx,
    * fhash) table — one rule for every video codec arm. */
  private def bandFrameHashes(fh: DataFrame): Dataset[FpBanded] = {
    val spark = fh.sparkSession
    import spark.implicits._
    fh.select(col("media_id"), col("fhash").as("phash"),
        explode(array((0 until 5).map(b =>
          (col("frame_idx").cast("long") * 20480L + lit(b.toLong * 4096L)
            + shiftright(col("fhash"), b * 12).bitwiseAND(lit(0xFFFL)))
            .as("bucket")): _*)).as("bucket"))
      .select(col("bucket"), col("media_id"), col("phash"))
      .as[FpBanded]
  }

  /** Ingest-time video COPY-CANDIDATE flagging — the streaming
    * prefilter for batch m09: a clip is flagged when ANY of its sampled
    * frames matches an earlier clip's frame at the same position within
    * hamming ≤ `maxHamming`. Deliberately more conservative than m09's
    * majority rule (any-match ⊇ majority, since a majority pair has
    * n_match ≥ 1 and banding is exact per position), so every clip
    * batch m09 would pair is flagged at ingest — the high-recall
    * candidate set a crawl quarantines for offline m09 verification.
    * Unlike [[detectFpDups]], every clip's frames ALWAYS enter state
    * (m09 pairs all clips, not just survivors); per-bucket verdicts as
    * ever — dedupe on media_id. */
  /** One micro-batch of frame-candidate flagging — shared by
    * [[detectFrameDupCandidates]] and its TTL variant (the [[vecStep]]
    * pattern). Unlike [[fpStep]], every frame always enters state. */
  private def frameStep(bucket: Long, rows: Seq[FpBanded],
      admitted0: List[(Long, Long)], maxHamming: Long)
      : (List[(Long, Long)], List[FpVerdict]) = {
    var admitted = admitted0
    val out = scala.collection.mutable.ListBuffer.empty[FpVerdict]
    rows.sortBy(_.media_id).foreach { r =>
      admitted.iterator
        .filter(_._1 != r.media_id)
        .map { case (origId, ph) =>
          (origId, java.lang.Long.bitCount(ph ^ r.phash).toLong) }
        .find(_._2 <= maxHamming)
        .foreach { case (origId, h) =>
          out += FpVerdict(bucket, r.media_id, origId, h)
        }
      admitted = (r.media_id, r.phash) :: admitted
    }
    (admitted, out.toList)
  }

  def detectFrameDupCandidates(banded: Dataset[FpBanded],
      maxHamming: Long = 4): Dataset[FpVerdict] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Long)], FpVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bucket: Long, rows: Iterator[FpBanded],
         state: GroupState[List[(Long, Long)]]) =>
          val (admitted, out) = frameStep(bucket, rows.toSeq,
            state.getOption.getOrElse(Nil), maxHamming)
          state.update(admitted)
          out.iterator
      }
  }

  /** [[detectFrameDupCandidates]] with [[detectWithTtl]]'s
    * bounded-state contract — frame buckets idle past `ttlMs` of event
    * time drop their hashes, so the candidate registry holds one TTL
    * horizon of frames. A transcode of a clip older than the horizon is
    * NOT flagged (its original has aged out) — the crawl's retention
    * window, chosen per deployment via `ttlMs`. */
  def detectFrameDupCandidatesWithTtl(banded: Dataset[TimedFpBanded],
      ttlMs: Long, maxHamming: Long = 4): Dataset[FpVerdict] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Long)], FpVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bucket: Long, rows: Iterator[TimedFpBanded],
         state: GroupState[List[(Long, Long)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rs = rows.toSeq
            val maxTs = rs.iterator.map(_.ts.getTime).max
            val (admitted, out) = frameStep(bucket,
              rs.map(r => FpBanded(r.bucket, r.media_id, r.phash)),
              state.getOption.getOrElse(Nil), maxHamming)
            state.update(admitted)
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Flag documents whose signature estimates ≥ `threshPm` Jaccard against
    * any previously-admitted signature in the same bucket. Emits one
    * Verdict per detected duplicate (first sighting is admitted silently). */
  def detect(banded: Dataset[Banded], threshPm: Long = 500)
      : Dataset[Verdict] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Seq[Long])], Verdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bucket: String, rows: Iterator[Banded],
         state: GroupState[List[(Long, Seq[Long])]]) =>
          var admitted = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[Verdict]
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            admitted.find { case (_, sig) =>
              MinHashAgg.estimateJaccardPm(sig, r.sig) >= threshPm
            } match {
              case Some((origId, _)) =>
                out += Verdict(r.doc_id, bucket, origId)
              case None =>
                admitted = (r.doc_id, r.sig) :: admitted
            }
          }
          state.update(admitted)
          out.iterator
      }
  }
}
