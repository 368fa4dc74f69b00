package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a small fake image payload"),
    (2L, "another, longer fake payload with more bytes in it"))
    .toDF("doc_id", "text")

  private lazy val media = Multimodal.withBinaryPayload(docs, "doc_id", "text")

  test("binary payload + metadata extraction is deterministic") {
    val meta = Multimodal.extractMeta(media)
    val m1 = meta.orderBy("media_id").collect()
    val m2 = Multimodal.extractMeta(media).orderBy("media_id").collect()
    assert(m1.toSeq == m2.toSeq)
    assert(m1(0).getAs[Long]("n_bytes") == "a small fake image payload".length)
    assert(m1(0).getAs[Int]("width") >= 1 && m1(0).getAs[Int]("width") <= 1920)
    assert(m1(0).getAs[String]("sha").length == 64)
  }

  test("feature extraction: fixed-dim float vectors via mapPartitions") {
    val feats = Multimodal.extractFeatures(media, dims = 16).collect()
    assert(feats.length == 2)
    assert(feats.forall(_.features.length == 16))
    // deterministic per payload
    val again = Multimodal.extractFeatures(media, dims = 16).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    feats.foreach(f => assert(again(f.media_id) == f.features.toSeq))
  }

  test("resize stub scales down only, preserving aspect bound") {
    val resized = Multimodal.resizeMeta(Multimodal.extractMeta(media), maxSide = 64)
    resized.collect().foreach { r =>
      assert(r.getAs[Int]("resized_width") <= 64 || r.getAs[Int]("resized_height") <= 64)
      assert(r.getAs[Int]("resized_width") <= r.getAs[Int]("width"))
    }
  }

  test("image header parse: real PNG/GIF/BMP/JPEG byte layouts") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(33)
      b.putInt(0x89504e47).putInt(0x0d0a1a0a) // signature
      b.putInt(13).put("IHDR".getBytes("US-ASCII")) // IHDR chunk header
      b.putInt(w).putInt(h)                         // big-endian dims
      b.put(Array[Byte](8, 6, 0, 0, 0)).putInt(0)   // bit depth..crc
      b.array()
    }
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes("US-ASCII") ++
        Array[Byte]((w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
          (h & 0xff).toByte, ((h >> 8) & 0xff).toByte, 0, 0, 0)
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(30).putInt(0).putInt(26)
      b.putInt(12) // DIB size (offset 14)
      b.putInt(w).putInt(h)
      b.array()
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(2 + 8 + 12)
      b.put(0xff.toByte).put(0xd8.toByte)                   // SOI
      b.put(0xff.toByte).put(0xe0.toByte).putShort(6)       // APP0 len=6
      b.putInt(0x4a464946)                                  // "JFIF"
      b.put(0xff.toByte).put(0xc0.toByte).putShort(8)       // SOF0 len=8
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      b.array()
    }
    assert(Multimodal.parseImageHeader(png(640, 480)) == ("png", 640, 480))
    assert(Multimodal.parseImageHeader(gif(320, 200)) == ("gif", 320, 200))
    assert(Multimodal.parseImageHeader(bmp(800, 600)) == ("bmp", 800, 600))
    assert(Multimodal.parseImageHeader(jpeg(1024, 768)) == ("jpeg", 1024, 768))
    assert(Multimodal.parseImageHeader("not an image".getBytes)._1 == "unknown")
    assert(Multimodal.parseImageHeader(Array.emptyByteArray)._1 == "unknown")
    // distributed pass over a payload table
    val media = Seq(
      (1L, png(64, 32)), (2L, gif(10, 20)), (3L, "nope".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val got = Multimodal.imageHeaders(media).collect()
      .map(h => h.media_id -> ((h.format, h.width, h.height))).toMap
    assert(got(1L) == ("png", 64, 32))
    assert(got(2L) == ("gif", 10, 20))
    assert(got(3L)._1 == "unknown")
  }

  test("synthPayload round-trips through parseImageHeader at boundary dims") {
    // the mm2 contract: generation arithmetic == parse result, exactly.
    // Boundary dims cover sign/endianness traps: 1, field-width maxima
    // (le16/be16 formats cap at 65535, the mm2 query stays far below),
    // and the byte-boundary values 255/256 where hi/lo byte swaps show.
    val dims = Seq(1, 2, 255, 256, 1080, 1919, 1920, 65535)
    for (f <- Seq("png", "gif", "bmp", "jpeg"); w <- dims; h <- dims)
      assert(Multimodal.parseImageHeader(Multimodal.synthPayload(f, w, h))
        == ((f, w, h)), s"round-trip failed for ($f, $w, $h)")
    assert(Multimodal.parseImageHeader(Multimodal.synthPayload("unknown", 9, 9))
      == (("unknown", -1, -1)))
  }

  test("audio synthPayload round-trips through parseAudioHeader at boundary values") {
    // channels: 1..8 (FLAC's 3-bit field maximum); sample rates cover the
    // byte boundaries of WAV's le32 and FLAC's 20-bit packed field
    val rates = Seq(1, 255, 256, 8000, 44100, 48000, 96000, 1048575)
    for (f <- Seq("wav", "flac"); ch <- Seq(1, 2, 8); sr <- rates)
      assert(Multimodal.parseAudioHeader(Multimodal.synthAudioPayload(f, ch, sr))
        == ((f, ch, sr)), s"round-trip failed for ($f, $ch, $sr)")
    assert(Multimodal.parseAudioHeader(Multimodal.synthAudioPayload("unknown", 1, 1))
      == (("unknown", -1, -1)))
    assert(Multimodal.parseAudioHeader("RIFFxxxxNOPE".getBytes("US-ASCII"))
      == (("unknown", -1, -1)))
    assert(Multimodal.parseAudioHeader(Array.emptyByteArray)._1 == "unknown")
  }

  test("video synthPayload round-trips through parseVideoHeader, both mvhd versions") {
    val cases = Seq((600L, 600L), (1L, 1L), (90000L, 0xffffffffL),
      (0xffffffffL, 123L))
    for ((ts, dur) <- cases; v1 <- Seq(false, true))
      assert(Multimodal.parseVideoHeader(
        Multimodal.synthVideoPayload("mp4", ts, dur, v1)) == (("mp4", ts, dur)),
        s"round-trip failed for ($ts, $dur, v1=$v1)")
    // version-1 64-bit duration only representable in the v1 layout
    val big = 0x1_0000_0000L
    assert(Multimodal.parseVideoHeader(
      Multimodal.synthVideoPayload("mp4", 600L, big, version1 = true))
      == (("mp4", 600L, big)))
    assert(Multimodal.parseVideoHeader(
      Multimodal.synthVideoPayload("unknown", 1, 1)) == (("unknown", -1L, -1L)))
    assert(Multimodal.parseVideoHeader(Array.emptyByteArray)._1 == "unknown")
    // a truncated moov (mvhd size larger than the remaining bytes) parses
    // as unknown, not an out-of-bounds read
    val whole = Multimodal.synthVideoPayload("mp4", 600L, 600L)
    assert(Multimodal.parseVideoHeader(whole.dropRight(20))._1 == "unknown")
  }

  test("real codec round-trip: PNG/BMP/GIF encode→decode is pixel-exact") {
    // PNG/BMP are lossless by design; GIF is lossless here because the
    // grayscale pattern stays within one 256-color palette. Any codec,
    // channel-order, or scanline bug shows as a pixel mismatch.
    for (id <- Seq(0L, 3L, 17L); fmt <- Seq("png", "bmp", "gif")) {
      val (w, h) = ((id % 24).toInt + 9, (id * 7 % 16).toInt + 9)
      val src = Multimodal.patternImage(w, h, id, grayscale = fmt == "gif")
      val back = Multimodal.decodeImage(Multimodal.encodeImage(src, fmt)).get
      assert(back.getWidth == w && back.getHeight == h, s"$fmt dims")
      for (y <- 0 until h; x <- 0 until w)
        assert((back.getRGB(x, y) & 0xffffff) == (src.getRGB(x, y) & 0xffffff),
          s"$fmt pixel ($x,$y) id=$id")
    }
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("real JPEG decode: dims exact, mean channel error within contract bound") {
    for (id <- Seq(1L, 8L, 23L)) {
      val (w, h) = ((id % 24).toInt + 9, (id * 7 % 16).toInt + 9)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var psum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((3L * x + 2L * y + id) % 160L).toInt + 40
        img.setRGB(x, y, (v << 16) | (v << 8) | v); psum += v
      }
      val back = Multimodal.decodeImage(Multimodal.encodeImage(img, "jpeg")).get
      assert(back.getWidth == w && back.getHeight == h)
      var sr = 0L
      for (y <- 0 until h; x <- 0 until w) sr += (back.getRGB(x, y) >> 16) & 0xff
      assert(math.abs(sr - psum) <= 3L * w * h,
        s"jpeg mean-luma error out of bound: |$sr - $psum| > ${3L * w * h}")
    }
  }

  test("nearest-neighbor half resize: out(x,y) = in(2x,2y), ceil dims, odd sizes") {
    for ((w, h) <- Seq((9, 9), (10, 16), (1, 1), (2, 3))) {
      val src = Multimodal.patternImage(w, h, 5L, grayscale = false)
      val out = Multimodal.resizeHalfNearest(src)
      assert(out.getWidth == (w + 1) / 2 && out.getHeight == (h + 1) / 2)
      for (y <- 0 until out.getHeight; x <- 0 until out.getWidth)
        assert(out.getRGB(x, y) == src.getRGB(2 * x, 2 * y))
    }
  }

  test("real WAV PCM16 encode→decode round-trips samples and rate exactly") {
    val samples = Array.tabulate(300)(i =>
      ((i.toLong * 7919L + 42L * 104729L) % 65536L - 32768L).toShort)
    val bytes = Multimodal.encodeWavPcm16(samples, 44100)
    // real RIFF container: the header parser agrees with the codec
    assert(Multimodal.parseAudioHeader(bytes) == (("wav", 1, 44100)))
    val Some((rate, got)) = Multimodal.decodeWavPcm16(bytes)
    assert(rate == 44100 && got.toSeq == samples.toSeq)
    assert(Multimodal.decodeWavPcm16("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("WAV codec interop with javax.sound is bidirectional and byte-level") {
    val samples = Array.tabulate(257)(i =>
      ((i.toLong * 104729L + 7L) % 65536L - 32768L).toShort)
    // our bytes decode through the REAL JDK codec, sample-exact
    val ours = Multimodal.encodeWavPcm16(samples, 16000)
    val Some((r1, viaJdk)) = Multimodal.decodeWavPcm16Jdk(ours)
    assert(r1 == 16000 && viaJdk.toSeq == samples.toSeq)
    // the JDK codec's bytes decode through ours, sample-exact
    val jdk = Multimodal.encodeWavPcm16Jdk(samples, 16000)
    val Some((r2, viaOurs)) = Multimodal.decodeWavPcm16(jdk)
    assert(r2 == 16000 && viaOurs.toSeq == samples.toSeq)
    // and a JUNK-chunk-leading container still decodes (chunk WALK, not
    // fixed offsets) — synthAudioPayload has no data chunk → None
    assert(Multimodal.decodeWavPcm16(
      Multimodal.synthAudioPayload("wav", 1, 8000)).isEmpty ||
      Multimodal.decodeWavPcm16(
        Multimodal.synthAudioPayload("wav", 1, 8000)).get._2.isEmpty)
  }

  test("decodeImageStats / decodeAudioStats: total over mixed corpora") {
    val good = Multimodal.encodeImage(
      Multimodal.patternImage(9, 9, 1L, grayscale = false), "png")
    val img = Seq((1L, good), (2L, "junk".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val istats = Multimodal.decodeImageStats(img).collect()
      .map(s => s.media_id -> s).toMap
    assert(istats(1L).format == "png" && istats(1L).n_px == 81L)
    assert(istats(2L).format == "unknown" && istats(2L).width == -1L
      && istats(2L).sum_r == 0L)
    val wav = Multimodal.encodeWavPcm16(Array[Short](100, -100, 50), 8000)
    val aud = Seq((1L, wav), (2L, "junk".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val astats = Multimodal.decodeAudioStats(aud).collect()
      .map(s => s.media_id -> s).toMap
    assert(astats(1L) == Multimodal.DecodedAudio(1L, 8000L, 3L, 50L, 250L, 2L))
    assert(astats(2L).sample_rate == -1L && astats(2L).n_samples == 0L)
  }

  test("realImageFeatures: decoded-luma histogram for images, byte profile fallback") {
    val good = Multimodal.encodeImage(
      Multimodal.patternImage(16, 16, 7L, grayscale = true), "png")
    val f = Multimodal.realImageFeatures(good, dims = 16)
    assert(f.length == 16 && math.abs(f.sum - 1.0f) < 1e-4)
    // grayscale ramp touches many bins
    assert(f.count(_ > 0f) > 8)
    val junk = "opaque blob".getBytes("UTF-8")
    assert(Multimodal.realImageFeatures(junk, 16).toSeq
      == Multimodal.fakeDecode(junk, 16).toSeq)
  }

  test("frame sampling explodes every k-th frame index") {
    val frames = Multimodal.sampleFrames(Multimodal.extractMeta(media), everyK = 10)
    val byId = frames.groupBy("media_id").agg(
      count(lit(1)).as("n"), max("frame_idx").as("maxIdx"), max("n_frames").as("nf"))
    byId.collect().foreach { r =>
      val expected = (r.getAs[Int]("nf") + 9) / 10
      assert(r.getAs[Long]("n") == expected)
      assert(r.getAs[Int]("maxIdx") < r.getAs[Int]("nf"))
    }
  }

  test("crafted near-2^32 WAV chunk sizes land in the undecodable row, never crash") {
    // a chunk size that would drive an Int cursor negative (ADVICE r12:
    // i += 8 + size.toInt overflows for size near Int.MaxValue) — the
    // Long-cursor walk must yield None/unknown, not AIOOBE
    def le32(v: Long) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    for (size <- Seq(Int.MaxValue.toLong - 4, Int.MaxValue.toLong + 100,
        0xfffffff0L)) {
      val payload = "RIFF".getBytes("US-ASCII") ++ le32(1000) ++
        "WAVE".getBytes("US-ASCII") ++
        "JUNK".getBytes("US-ASCII") ++ le32(size) ++ Array.fill(64)(0.toByte)
      assert(Multimodal.decodeWavPcm16(payload).isEmpty)
      assert(Multimodal.parseAudioHeader(payload) == ("unknown", -1, -1))
    }
    // and a well-formed file after the fix still decodes
    val good = Multimodal.encodeWavPcm16(Array[Short](1, -2, 3), 8000)
    assert(Multimodal.decodeWavPcm16(good).exists(_._2.toSeq == Seq[Short](1, -2, 3)))
  }
}
