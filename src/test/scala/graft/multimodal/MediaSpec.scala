package graft.multimodal

import org.apache.spark.sql.functions._

import graft.helium.SparkSuite
import Media._

class MediaSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("media records carry binary payloads with typed metadata") {
    val media = mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val r = media.head()
    assert(Set("image", "audio", "video").contains(r.kind))
    assert(r.payload.nonEmpty)
    assert(media.count() == docs.count())
  }

  test("batched decode produces deterministic features; payload pruned from output") {
    val feats = decodeFeatures(mediaFromDocuments(docs))
    assert(!feats.schema.fieldNames.contains("payload"))
    val f = feats.orderBy("media_id").head()
    // deterministic fake: dimensions derived from byte length
    assert(f.width == (f.n_bytes % 640).toInt)
    assert(f.checksum.length == 32)
    // video gets frame sampling, stills get 1
    val byKind = feats.groupBy("kind").agg(min("n_frames"), max("n_frames"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(byKind("image") == ((1, 1)))
    assert(byKind.get("video").forall(_._2 >= 1))
  }

  /** A real PNG encoded in-test: `w`x`h` gradient raster through
    * ImageIO.write — the decode path sees genuine codec bytes. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("image payloads with real PNG bytes decode to actual pixel dimensions") {
    val recs = Seq(
      MediaRecord(1L, "image", pngBytes(37, 21), "camera"),
      MediaRecord(2L, "image", pngBytes(640, 480), "camera"),
      // text bytes under an image kind: not a parseable image, must take
      // the deterministic fallback instead of failing the partition
      MediaRecord(3L, "image", "not an image at all".getBytes("UTF-8"), "crawl"))
    val feats = decodeFeatures(recs.toDS()).collect().map(f => f.media_id -> f).toMap
    assert((feats(1L).width, feats(1L).height) == ((37, 21)))
    assert((feats(2L).width, feats(2L).height) == ((640, 480)))
    val n3 = feats(3L).n_bytes
    assert((feats(3L).width, feats(3L).height) ==
      (((n3 % 640).toInt, ((n3 * 7) % 480).toInt)))
  }

  /** A real WAV encoded in-test through javax.sound: `frames` frames of
    * silence at `rate` Hz, `channels` channels, 16-bit. */
  private def wavBytes(rate: Int, channels: Int, frames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audio payloads with real WAV bytes parse to rate/channels/frames") {
    val recs = Seq(
      MediaRecord(1L, "audio", wavBytes(16000, 1, 1234), "mic"),
      MediaRecord(2L, "audio", wavBytes(44100, 2, 777), "mic"),
      MediaRecord(3L, "audio", "definitely not riff".getBytes("UTF-8"), "crawl"))
    val f = decodeFeatures(recs.toDS()).collect().map(x => x.media_id -> x).toMap
    // audio mapping: width = sample rate, height = channels, n_frames = frames
    assert((f(1L).width, f(1L).height, f(1L).n_frames) == ((16000, 1, 1234)))
    assert((f(2L).width, f(2L).height, f(2L).n_frames) == ((44100, 2, 777)))
    val n3 = f(3L).n_bytes
    assert((f(3L).width, f(3L).n_frames) == (((n3 % 640).toInt, 1)))
  }

  test("resize really downscales decodable images — output is still a valid image") {
    val big = pngBytes(256, 256)
    assert(big.length > 4000)
    val recs = Seq(MediaRecord(1L, "image", big, "camera"))
    val out = resize(recs.toDS(), 4000).collect().head
    assert(out.payload.length <= 4000)
    // still decodable (truncation would have destroyed the container) and
    // geometrically a halving of the original
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.payload))
    assert(img != null, "resized payload is no longer a decodable image")
    assert(img.getWidth < 256 && 256 % img.getWidth == 0)
  }

  test("bmpFromBytes round-trips through ImageIO to the exact byte->pixel mapping") {
    val bytes = (0 until 97).map(i => ((i * 37 + 11) % 256).toByte).toArray
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bmpFromBytes(bytes)))
    assert(img != null && img.getWidth == 8 && img.getHeight == 8)
    def b(i: Int): Int = bytes(i % bytes.length) & 0xFF
    for (y <- 0 until 8; x <- 0 until 8) {
      val p = (y * 8 + x) * 3
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
        == ((b(p), b(p + 1), b(p + 2))),
        s"pixel ($x,$y) diverged from the byte mapping the oracle assumes")
    }
  }

  test("aHash60 golden: half-dark/half-bright image sets exactly the bright bits") {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = if (y < 4) 50 else 200 // gray((v,v,v)) = v exactly
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    // mean = (32*50 + 32*200)/64 = 125; bright pixels are 32..63, of
    // which 32..59 carry hash bits
    val expected = (32 until 60).foldLeft(0L)((a, p) => a | (1L << p))
    assert(aHash60(img) == expected)
    // constant image: strict > at the mean hashes to zero, not all-ones
    val flat = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) flat.setRGB(x, y, 0x808080)
    assert(aHash60(flat) == 0L)
  }

  test("m07 pairs a PNG<->BMP re-encode of the same image; m06's byte checksum cannot") {
    // one 8x8 image, two containers: same pixels, different bytes
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, ((x * 53 + y * 19) * 2654435) & 0xFFFFFF)
    def enc(fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val (png, bmp) = (enc("png"), enc("bmp"))
    assert(!java.util.Arrays.equals(png, bmp), "containers must differ bytewise")
    val recs = Seq(
      MediaRecord(1L, "image", png, "crawl"),
      MediaRecord(2L, "image", bmp, "crawl")).toDS()
    // perceptual: identical fingerprints -> hamming 0 -> one dup group
    val hashes = perceptualHashes(recs).collect().map(h => h.media_id -> h.phash).toMap
    assert(hashes(1L) == hashes(2L),
      s"re-encode changed the perceptual hash: $hashes")
    // byte-space (the m06 path: 64-byte thumbnail checksum): MISSES them
    val sums = decodeFeatures(resize(recs, 64)).collect()
      .map(f => f.media_id -> f.checksum).toMap
    assert(sums(1L) != sums(2L),
      "byte checksums unexpectedly collided — the m07 contrast test is vacuous")
  }

  test("aHash60 is invariant under pixel-replication upscale (box means)") {
    val small = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val big = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val rgb = ((x * 41 + y * 13) * 97) & 0xFFFFFF
      small.setRGB(x, y, rgb)
      for (dy <- 0 to 1; dx <- 0 to 1) big.setRGB(2 * x + dx, 2 * y + dy, rgb)
    }
    assert(aHash60(small) == aHash60(big),
      "a 2x resized copy must carry the identical fingerprint")
  }

  test("a torn PNG header degrades to fallback features, never an exception") {
    val torn = pngBytes(16, 16).take(12) // magic intact, IHDR truncated
    val f = decodeFeatures(Seq(MediaRecord(9L, "image", torn, "crawl")).toDS())
      .collect().head
    assert(f.n_bytes == 12 && f.width == (12 % 640))
  }

  test("decode runs per-partition (partition count preserved, no shuffle)") {
    // with the parallelism floor off, decode never moves a row
    spark.conf.set("spark.graft.scan.fanout", "false")
    try {
      val media = mediaFromDocuments(docs).repartition(3)
      val feats = decodeFeatures(media)
      assert(feats.rdd.getNumPartitions == 3)
    } finally spark.conf.unset("spark.graft.scan.fanout")
    // the floor widens a NARROW input to session width (round-robin of
    // the payload rows into the decode stage — never a key shuffle);
    // an input at/above width passes through untouched
    val target = spark.sparkContext.defaultParallelism
    val narrow = decodeFeatures(mediaFromDocuments(docs).repartition(1))
    assert(narrow.rdd.getNumPartitions == target)
    val wide = decodeFeatures(
      mediaFromDocuments(docs).repartition(target + 1))
    assert(wide.rdd.getNumPartitions == target + 1)
  }

  test("resize truncates oversized payloads only") {
    val media = mediaFromDocuments(docs)
    val resized = resize(media, 100)
    assert(resized.collect().forall(_.payload.length <= 100))
    val small = resize(media, 1 << 20).collect().map(_.payload.length).sum
    val orig = media.collect().map(_.payload.length).sum
    assert(small == orig)
  }

  test("wavFromBytes round-trips through javax.sound to the exact byte->sample mapping") {
    val bytes = (0 until 97).map(i => ((i * 37 + 11) % 256).toByte).toArray
    val samples = readWavSamples(wavFromBytes(bytes))
      .getOrElse(fail("self-encoded WAV did not parse"))
    assert(samples.length == bytes.length)
    assert(samples.sameElements(bytes.map(_ & 0xFF)),
      "samples diverged from the byte mapping the oracle assumes")
    // empty payload: a real (if silent) container, zero frames, hash 0
    assert(readWavSamples(wavFromBytes(Array.emptyByteArray))
      .exists(_.isEmpty))
    assert(envHash60(Array.emptyIntArray) == 0L)
  }

  test("envHash60 golden: loud-half/quiet-half envelope sets exactly the loud bits") {
    // 6400 samples -> 100 per window; windows 0..31 at 200, 32..63 at 50
    val samples = Array.tabulate(6400)(i => if (i < 3200) 200 else 50)
    // e_k = 20000 or 5000; mean = (32*20000 + 32*5000)/64 = 12500; loud
    // windows are 0..31, all of which carry hash bits
    val expected = (0 until 32).foldLeft(0L)((a, p) => a | (1L << p))
    assert(envHash60(samples) == expected)
    // constant signal: strict > at the mean hashes to zero, not all-ones
    assert(envHash60(Array.fill(640)(128)) == 0L)
  }

  /** A real 16-bit signed little-endian mono WAV whose frame i carries
    * sample value `(s(i) - 128) << 8` — the 16-bit re-encode of the 8-bit
    * unsigned stream `s`. */
  private def wav16(s: Array[Int]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](s.length * 2)
    for (i <- s.indices) {
      val v = (s(i) - 128) << 8
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, s.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("m08 pairs an 8-bit re-encode of a 16-bit clip; m06's byte checksum cannot") {
    // one waveform, two bit depths: same envelope, different bytes
    val s = Array.tabulate(1280)(i => 128 + (if ((i / 20) % 2 == 0) 90 else -90))
    val clip16 = wav16(s)
    val clip8 = wavFromBytes(s.map(_.toByte)) // 8-bit unsigned carries s verbatim
    assert(!java.util.Arrays.equals(clip16, clip8))
    val recs = Seq(
      MediaRecord(1L, "audio", clip16, "mic"),
      MediaRecord(2L, "audio", clip8, "mic"),
      MediaRecord(3L, "audio", wav16(s.map(v => 256 - v)), "mic")) // inverted
    val h = audioHashes(recs.toDS()).collect().map(x => x.media_id -> x.phash).toMap
    // REAL decode on both containers lands the re-encode at hamming 0...
    assert(h(1L) == h(2L),
      "16-bit and 8-bit encodes of the same waveform must hash identically")
    // ...while the byte checksum sees two unrelated files
    val ck = decodeFeatures(recs.toDS()).collect().map(x => x.media_id -> x.checksum).toMap
    assert(ck(1L) != ck(2L))
    // and a genuinely different envelope stays far (> the m08 threshold)
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) > 4,
      s"inverted envelope unexpectedly close: ${java.lang.Long.bitCount(h(1L) ^ h(3L))}")
  }

  test("gifFromBytes round-trips through the ImageIO GIF reader to the " +
    "exact byte->frame-pixel mapping") {
    val bytes = (0 until 97).map(i => ((i * 37 + 11) % 256).toByte).toArray
    val gif = gifFromBytes(bytes, 5)
    assert(gifMeta(gif).contains((8, 8, 5)))
    def b(i: Int): Int = bytes(i % bytes.length) & 0xFF
    // energies via the REAL reader must equal the byte formula the m02
    // oracle assumes: frame f's energy = sum of bytes (f*64+p) mod n
    val got = gifFrameEnergies(gif, 1).get
    val want = (0 until 5).map(f =>
      (f, (0 until 64).map(p => b(f * 64 + p).toLong).sum))
    assert(got == want, s"decoded energies diverged from the byte mapping")
  }

  test("sampleFrames demuxes a REAL animated GIF: container frame count, " +
    "not the byte-length formula") {
    val bytes = (0 until 130).map(i => ((i * 13 + 5) % 256).toByte).toArray
    val gif = gifFromBytes(bytes, 10)
    // the fake-era formula would predict (gif.length % 24) + 1 frames —
    // make sure that's NOT 10, so the assertion below can only pass via
    // a genuine container read
    assert((gif.length % 24) + 1 != 10, "fixture degenerate — resize bytes")
    val recs = Seq(
      MediaRecord(1L, "video", gif, "crawl"),
      // non-GIF payload: wrapped arm, frames (n % 24) + 1
      MediaRecord(2L, "video", "plain text payload".getBytes("UTF-8"), "crawl"))
    val frames = sampleFrames(recs.toDS(), stride = 4).collect()
      .groupBy(_.media_id)
    def b(i: Int): Int = bytes(i % bytes.length) & 0xFF
    assert(frames(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 4, 8))
    frames(1L).foreach { fr =>
      val want = (0 until 64).map(p => b(fr.frame_idx * 64 + p).toLong).sum
      assert(fr.feat == want, s"frame ${fr.frame_idx} energy diverged")
    }
    val n2 = "plain text payload".getBytes("UTF-8").length
    assert(frames(2L).map(_.frame_idx).max < n2 % 24 + 1)
    // decodeFeatures reads the same container: real dims + frame count
    val f1 = decodeFeatures(recs.toDS()).collect()
      .map(x => x.media_id -> x).toMap
    assert((f1(1L).width, f1(1L).height, f1(1L).n_frames) == ((8, 8, 10)))
  }

  test("GIF frame energies are palette-representation-invariant " +
    "(re-encode with an inverted palette hashes identically)") {
    val bytes = (0 until 64).map(i => ((i * 29 + 3) % 256).toByte).toArray
    val direct = gifFromBytes(bytes, 3)
    // same PIXEL VALUES under an inverted palette: index j paints gray
    // 255-j and every raster sample is inverted — different container
    // bytes, identical decoded colors
    val inv = {
      val grays = Array.tabulate(256)(j => (255 - j).toByte)
      val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        def b(i: Int): Int = bytes(i % bytes.length) & 0xFF
        (0 until 3).foreach { f =>
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          (0 until 64).foreach(p =>
            img.getRaster.setSample(p % 8, p / 8, 0, 255 - b(f * 64 + p)))
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      out.toByteArray
    }
    assert(!java.util.Arrays.equals(direct, inv))
    assert(gifFrameEnergies(direct, 1) == gifFrameEnergies(inv, 1),
      "palette re-encode of identical pixels changed the decoded features")
  }

  test("frameHashes: wrapped arm equals the m09 oracle's byte formula") {
    val bytes = (0 until 97).map(i => ((i * 53 + 7) % 256).toByte).toArray
    // not a GIF → wrapped arm: (97 % 24) + 1 = 2 frames, stride 4 → [0]
    val got = frameHashes(
      Seq(MediaRecord(5L, "video", bytes, "crawl")).toDS(), stride = 4)
      .collect().map(x => (x.media_id, x.frame_idx, x.fhash)).toSeq
    def b(i: Int): Int = bytes(i % bytes.length) & 0xFF
    val grays = (0 until 64).map(p => b(p).toLong)
    val mean = grays.sum / 64
    val want = (0 until 60).foldLeft(0L)((acc, p) =>
      if (grays(p) > mean) acc | (1L << p) else acc)
    assert(got == Seq((5L, 0, want)))
  }

  /** Re-encode `base`'s frames under an INVERTED palette — different
    * container bytes, identical decoded pixels (the palette-invariance
    * fixture generalized to n frames). */
  private def invertedGif(base: Array[Byte], nFrames: Int): Array[Byte] = {
    val grays = Array.tabulate(256)(j => (255 - j).toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      def b(i: Int): Int = base(i % base.length) & 0xFF
      (0 until nFrames).foreach { f =>
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        (0 until 64).foreach(p =>
          img.getRaster.setSample(p % 8, p / 8, 0, 255 - b(f * 64 + p)))
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  test("m09 pairing over REAL demuxed clips: a palette re-encode matches " +
    "at every position; the majority rule gates partial corruption") {
    val base = (0 until 576).map(i => ((i * 31 + 17) % 256).toByte).toArray
    def corrupt(frames: Seq[Int]): Array[Byte] = {
      val arr = base.clone()
      frames.foreach(f => (0 until 64).foreach(p =>
        arr(f * 64 + p) = (~arr(f * 64 + p)).toByte))
      arr
    }
    // 9 frames, stride 4 → sampled positions 0, 4, 8 (three per clip)
    val recs = Seq(
      MediaRecord(1L, "video", gifFromBytes(base, 9), "crawl"),
      // same pixels, different container bytes — the transcode case
      MediaRecord(2L, "video", invertedGif(base, 9), "crawl"),
      // one of three sampled frames complemented: 2/3 majority holds
      MediaRecord(3L, "video", gifFromBytes(corrupt(Seq(8)), 9), "crawl"),
      // two of three complemented: 1/3 — below majority
      MediaRecord(4L, "video", gifFromBytes(corrupt(Seq(4, 8)), 9), "crawl"))
    val pairs = graft.queries.MultimodalOps.frameNearDupPairs(
      frameHashes(recs.toDS(), stride = 4).toDF())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(pairs((1L, 2L)) == ((3L, 3L)),
      s"transcoded copy should match every sampled position: $pairs")
    assert(pairs((1L, 3L)) == ((3L, 2L)),
      s"single corrupted frame should keep the 2/3 majority: $pairs")
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)),
      s"minority match must not pair: $pairs")
  }

  test("a torn GIF degrades to the wrapped fallback, never an exception") {
    val torn = gifFromBytes(Array[Byte](1, 2, 3), 4).take(10) // header only
    val fr = sampleFrames(
      Seq(MediaRecord(7L, "video", torn, "crawl")).toDS(), stride = 4)
      .collect()
    // wrapped arm: (10 % 24) + 1 = 11 frames, sampled at 0, 4, 8
    assert(fr.map(_.frame_idx).sorted.toSeq == Seq(0, 4, 8))
  }

  // ---- AVI/MJPEG: the pure-JVM non-GIF video codec path ----------------

  /** One JDK-encoded JPEG frame: 16×12 grayscale gradient shifted by
    * `phase` — distinct per phase, smooth enough that a second-generation
    * re-encode decodes to near-identical pixels. */
  private def jpegFrame(phase: Int, w: Int = 16, h: Int = 12): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, ((x * 16 + y * 3 + phase) % 256))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", out)
    out.toByteArray
  }

  test("MJPEG mux/demux round trip: every frame comes back byte-identical, " +
    "in order, through the RIFF walker") {
    val frames = (0 until 7).map(jpegFrame(_))
    val avi = aviFromJpegFrames(frames, 16, 12)
    assert(looksLikeAvi(avi))
    val back = aviFrames(avi)
    assert(back.isDefined && back.get.size == 7)
    back.get.zip(frames).foreach { case (g, e) =>
      assert(java.util.Arrays.equals(g, e), "frame bytes changed in transit")
    }
  }

  test("mjpegCensus on a DIRECT real MJPEG AVI: container-read frame " +
    "count and an earned frames_ok at non-8x8 dimensions") {
    val avi = aviFromJpegFrames((0 until 5).map(jpegFrame(_)), 16, 12)
    val got = mjpegCensus(
      Seq(MediaRecord(1L, "video", avi, "crawl")).toDS()).collect()
    assert(got.toSeq == Seq(ClipCensus(1L, "crawl", 5, frames_ok = true)))
  }

  test("mjpegCensus certificate FLIPS on a garbage frame chunk — " +
    "frames_ok is earned from real decode, not assumed") {
    val avi = aviFromJpegFrames(
      Seq(jpegFrame(0), Array.fill[Byte](40)(0x5A)), 16, 12)
    val got = mjpegCensus(
      Seq(MediaRecord(2L, "video", avi, "crawl")).toDS()).collect()
    assert(got.toSeq == Seq(ClipCensus(2L, "crawl", 2, frames_ok = false)))
  }

  test("re-encoded MJPEG copy pairs with its original through the frame-" +
    "hash band join; unrelated content does not") {
    // clip A: first-generation JPEG frames; clip B: decode A's frames and
    // re-encode (second generation) — different bytes, near-identical
    // pixels; clip C: different content entirely
    val aFrames = (0 until 8).map(jpegFrame(_))
    val bFrames = aFrames.map { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", out)
      out.toByteArray
    }
    val cFrames = (0 until 8).map(i => jpegFrame(phase = 128 + 7 * i))
    assert(aFrames.map(_.toSeq) != bFrames.map(_.toSeq),
      "fixture degenerate: re-encode was byte-identical")
    val media = Seq(
      MediaRecord(1L, "video", aviFromJpegFrames(aFrames, 16, 12), "crawl"),
      MediaRecord(2L, "video", aviFromJpegFrames(bFrames, 16, 12), "crawl"),
      MediaRecord(3L, "video", aviFromJpegFrames(cFrames, 16, 12), "crawl")
    ).toDS()
    val pairs = graft.queries.MultimodalOps.frameNearDupPairs(
      mjpegFrameHashes(media, stride = 1).toDF())
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "re-encoded copy not detected")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"unrelated clips paired: $pairs")
  }

  test("a torn AVI degrades: header-only truncation falls back to the " +
    "wrapped arm; mid-chunk truncation demuxes the intact prefix") {
    val avi = aviFromJpegFrames((0 until 6).map(jpegFrame(_)), 16, 12)
    assert(aviFrames(avi.take(16)).isEmpty, "header-only should demux to None")
    val census = mjpegCensus(
      Seq(MediaRecord(9L, "video", avi.take(16), "crawl")).toDS()).collect()
    // wrapped arm: (16 % 24) + 1 = 17 frames of the byte-wrap
    assert(census.toSeq == Seq(ClipCensus(9L, "crawl", 17, frames_ok = true)))
  }

  test("feature extraction then aggregate: binary never enters the shuffle") {
    val plan = decodeFeatures(mediaFromDocuments(docs)).toDF()
      .groupBy("kind").agg(sum("n_bytes"))
      .queryExecution.executedPlan.toString
    // the row that would shuffle is the SerializeFromObject output of the
    // decode — it must carry features only, never the binary payload
    val serialized = plan.linesIterator
      .find(_.contains("SerializeFromObject")).getOrElse("")
    assert(serialized.nonEmpty && !serialized.contains("payload"))
  }
}
