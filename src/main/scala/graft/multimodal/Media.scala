package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted in batches.
  *
  * IMAGE decode is REAL: payloads carrying a known still-image container
  * (PNG/JPEG/GIF/BMP, sniffed by magic bytes) go through JDK ImageIO and
  * report actual pixel dimensions. Audio/video decode remains STUBBED
  * (no ffmpeg in this container) with a deterministic fake, as is any
  * image payload ImageIO cannot parse — so synthetic text-derived
  * payloads flow through the same plumbing with reproducible features.
  * Either way the Spark-side structure is real and tested: schema, batch
  * shape, partition-parallel execution, and the projection contract
  * (payload is pruned away the moment features are extracted, so the
  * wide binary column never travels through a shuffle).
  *
  * 100 TB notes: media payloads dominate bytes; the rules that matter are
  * (1) never groupBy/join on a plan that still carries `payload` — extract
  * features first, then shuffle the narrow rows; (2) decode per-partition
  * in batches (here via `mapPartitions` over an iterator — the Scala
  * analogue of Arrow-batched Pandas UDFs) so codec init cost amortizes.
  */
object Media {

  // In-memory image streams: ImageIO's default disk cache would wrap
  // every already-in-memory payload in a FileCacheImageInputStream —
  // one temp-file create/write/delete per decoded row on every
  // executor, exactly the per-row codec-setup I/O this pipeline must
  // not pay. Object init runs once per executor JVM.
  javax.imageio.ImageIO.setUseCache(false)

  /** An opaque media record: binary payload + typed envelope. */
  case class MediaRecord(
      media_id: Long,
      kind: String,            // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Extracted features — narrow, shuffle-safe. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      source: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: String)

  /** Build a media table from `documents` (text bytes standing in for real
    * payloads — deterministic, schema-faithful). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      col("source"))
      .as[MediaRecord]
  }

  /** Magic-byte sniff for still-image containers ImageIO can open. The
    * sniff is O(4 bytes), so non-image payloads (text-derived synthetics,
    * audio/video bitstreams) skip codec setup entirely — at 100 TB the
    * common case must not pay reader-probe allocation per row. */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) || // JPEG SOI
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
      (p(0) == 'B' && p(1) == 'M'))

  /** Real image decode via JDK ImageIO; None when the payload is not a
    * parseable image (caller falls back to the deterministic fake). A
    * corrupt container must degrade to fallback features, never kill the
    * partition — at scale some fraction of crawled media is always torn. */
  private def decodeImage(p: Array[Byte]): Option[(Int, Int)] =
    if (!looksLikeImage(p)) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))
      .map(img => (img.getWidth, img.getHeight))
    catch { case _: Exception => None }

  /** RIFF/WAVE container sniff — the audio analogue of [[looksLikeImage]]. */
  private def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Real audio header parse via `javax.sound.sampled` (WAV/AIFF ship
    * with the JDK — no external codec needed): (sampleRate, channels,
    * frames). None on anything unparseable, same degrade-not-die contract
    * as [[decodeImage]]. */
  private def decodeWav(p: Array[Byte]): Option[(Int, Int, Int)] =
    if (!looksLikeWav(p)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val f = in.getFormat
        val frames = in.getFrameLength
        // streaming-encoder WAVs carry placeholder/unknown data-chunk
        // sizes (frame length reported negative/NOT_SPECIFIED or as an
        // absurd 0xFFFFFFFF-derived value) — those must take the
        // fallback, not poison downstream frame sums
        if (frames < 0 || frames > Int.MaxValue.toLong) None
        else Some((f.getSampleRate.toInt, f.getChannels, frames.toInt))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Decoder: real ImageIO for decodable image payloads and real
    * javax.sound header parsing for WAV audio (feature mapping for
    * audio: width = sample rate, height = channels, n_frames = frame
    * count); deterministic fake (dimensions derived from payload bytes)
    * for everything else — video codecs are the remaining `???` seam
    * (no ffmpeg here). */
  private def decodeOne(r: MediaRecord): MediaFeatures = {
    // ??? <- real video codec call goes here (e.g. ffmpeg bindings)
    val n = r.payload.length.toLong
    val realImg = if (r.kind == "image") decodeImage(r.payload) else None
    val realWav = if (r.kind == "audio") decodeWav(r.payload) else None
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      source = r.source,
      n_bytes = n,
      width = realImg.map(_._1)
        .orElse(realWav.map(_._1)).getOrElse((n % 640).toInt),
      height = realImg.map(_._2)
        .orElse(realWav.map(_._2)).getOrElse(((n * 7) % 480).toInt),
      n_frames = realWav.map(_._3).getOrElse(
        if (r.kind == "video") (n % 24 + 1).toInt else 1),
      // md5 over the UPPERCASE-HEX encoding of the payload bytes (not the
      // raw bytes): DuckDB 1.0's md5() only accepts VARCHAR, so hashing the
      // hex string is the only oracle-expressible checksum with BYTE
      // semantics — a byte-truncated payload is a substr() of its hex.
      checksum = {
        val hexStr = r.payload.map("%02X".format(_)).mkString
        java.security.MessageDigest.getInstance("MD5")
          .digest(hexStr.getBytes("UTF-8")).map("%02x".format(_)).mkString
      })
  }

  /** Batched partition-parallel decode: iterator-in/iterator-out, one codec
    * "session" per partition (the amortization seam). */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init would happen here (codec contexts, model load)
      it.map(decodeOne)
    }
  }

  /** One sampled frame of a video payload — narrow, shuffle-safe. */
  case class FrameSample(
      media_id: Long,
      source: String,
      frame_idx: Int,
      feat: Long)

  /** Frame sampling: every `stride`-th frame of each video decoded to a
    * per-frame feature (deterministic fake behind the same codec seam as
    * [[decodeFeatures]]). Iterator-in/iterator-out flatMap inside
    * `mapPartitions`, so one codec session amortizes across a partition
    * and the wide payload never outlives the partition — only the narrow
    * (id, idx, feat) rows continue into shuffles. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 4): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init would happen here (demuxer/decoder contexts)
      it.filter(_.kind == "video").flatMap { r =>
        // ??? <- real frame decode goes here (e.g. ffmpeg seek+decode)
        val n = r.payload.length.toLong
        val nFrames = (n % 24 + 1).toInt
        (0 until nFrames by stride).iterator.map(i =>
          FrameSample(r.media_id, r.source, i, (n * 31 + i) % 1000))
      }
    }
  }

  /** One fixed-size shard of a payload. */
  case class PayloadChunk(
      media_id: Long,
      kind: String,
      chunk_idx: Int,
      chunk: Array[Byte])

  /** Chunk payloads into fixed-size shards executor-side — the sharding
    * step before object-store upload / transport of large blobs. The
    * explosion happens inside `mapPartitions` (never a byte-level Spark
    * explode), and each output row carries one bounded chunk, so
    * downstream shuffles move at most `chunkBytes` per row. */
  def chunkPayloads(media: Dataset[MediaRecord],
      chunkBytes: Int): Dataset[PayloadChunk] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.payload.length
        val nChunks = math.max((n + chunkBytes - 1) / chunkBytes, 1)
        (0 until nChunks).iterator.map { i =>
          PayloadChunk(r.media_id, r.kind, i,
            r.payload.slice(i * chunkBytes, math.min((i + 1) * chunkBytes, n)))
        }
      }
    }
  }

  /** Real image downscale: halve dimensions (bilinear) and re-encode PNG
    * until the payload fits `maxBytes` — the output stays a DECODABLE
    * image, which byte truncation never is. Gives up (returns None) if
    * even 1×1 doesn't fit or the payload isn't a parseable image. */
  private def resizeImage(p: Array[Byte], maxBytes: Int): Option[Array[Byte]] =
    if (!looksLikeImage(p)) None
    else try {
      var img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      if (img == null) return None
      var out: Array[Byte] = null
      var attempts = 0
      while (out == null && attempts < 12 &&
          img.getWidth > 0 && img.getHeight > 0) {
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", buf)
        val bytes = buf.toByteArray
        if (bytes.length <= maxBytes) out = bytes
        else {
          val (w2, h2) = (math.max(img.getWidth / 2, 1),
            math.max(img.getHeight / 2, 1))
          if (w2 == img.getWidth && h2 == img.getHeight) attempts = 12
          else {
            val scaled = new java.awt.image.BufferedImage(
              w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w2, h2, null)
            g.dispose()
            img = scaled
          }
        }
        attempts += 1
      }
      Option(out)
    } catch { case _: Exception => None }

  /** Resize: same batch plumbing, payload-in/payload-out — the
    * transform-preserving path (thumbnailing before feature extraction).
    * Decodable images are REALLY downscaled (still decodable after);
    * everything else falls back to byte truncation, the deterministic
    * stand-in for the missing audio/video transcoders. */
  def resize(media: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (r.payload.length <= maxBytes) r
        else r.copy(payload = resizeImage(r.payload, maxBytes)
          .getOrElse(r.payload.take(maxBytes)))
      }
    }
  }
}
