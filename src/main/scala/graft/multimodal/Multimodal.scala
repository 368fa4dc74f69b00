package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * Header parsing (container sniff + dimensions) is pure byte arithmetic
  * ([[parseImageHeader]] / [[parseAudioHeader]] / [[parseVideoHeader]]).
  * PIXEL and SAMPLE decode are REAL as of round 14: the JDK's standard
  * `javax.imageio` codecs (PNG/BMP/GIF/JPEG — no external jars) and
  * `javax.sound.sampled` (RIFF/WAVE PCM) run inside the same
  * partition-preserving `mapPartitions` batch shape. PNG/BMP/GIF and WAV
  * PCM16 round-trip bit-exactly, so decoded pixel/sample statistics sit
  * under the cross-engine hash gate (the oracle replays the generation
  * arithmetic the codec must reproduce). [[fakeDecode]] remains only as
  * the fallback featurizer for payloads no codec recognizes.
  *
  * 100 TB shape: payloads never pass through a shuffle — metadata is
  * extracted first, heavy bytes stay columnar in parquet until the map
  * stage that needs them, and every decode pass is one fused
  * partition-preserving map.
  */
object Multimodal {

  // ImageIO's default scratch-file cache adds disk I/O (and temp files)
  // per encode/decode on every executor thread; byte-array streams need
  // no cache at all.
  ImageIO.setUseCache(false)

  final case class MediaMeta(
      media_id: Long, kind: String, n_bytes: Long,
      sha: String, width: Int, height: Int)

  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** Attach a binary payload column (demo: UTF-8 bytes of a text column —
    * the stand-in for real image/audio bytes). */
  def withBinaryPayload(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      encode(col(srcCol), "UTF-8").as("payload"),
      lit("image/fake").as("kind"))

  /** Metadata extraction — pure column expressions, no decode needed. The
    * fake width/height are deterministic functions of the payload hash
    * (stand-ins for a header parse). */
  def extractMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sha"),
      (pmod(xxhash64(col("payload")), lit(1920L)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col("payload"), lit(1)), lit(1080L)) + 1).cast("int").as("height"))

  final case class ImageHeader(
      media_id: Long, format: String, width: Int, height: Int)

  /** REAL header decode (no codec needed — pure byte parsing): container
    * format + pixel dimensions from PNG (IHDR, big-endian), GIF
    * (logical-screen, little-endian), BMP (DIB header, little-endian)
    * and JPEG (SOF marker scan). Unknown/truncated payloads → format
    * "unknown", dims -1. This is the piece of "image decode" that needs
    * no image library, so it is implemented for real; pixel decode stays
    * behind [[fakeDecode]].
    */
  def parseImageHeader(bytes: Array[Byte]): (String, Int, Int) = {
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    val n = bytes.length
    if (n >= 24 && be32(0) == 0x89504e47 && be32(4) == 0x0d0a1a0a)
      ("png", be32(16), be32(20))
    else if (n >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
      ("gif", le16(6), le16(8))
    else if (n >= 26 && bytes(0) == 'B' && bytes(1) == 'M')
      ("bmp", le32(18), math.abs(le32(22)))
    else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the first SOFn (C0-CF minus C4/C8/CC)
      var i = 2
      while (i + 9 < n && u8(i) == 0xff) {
        val marker = u8(i + 1)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return ("jpeg", be16(i + 7), be16(i + 5))
        val len = be16(i + 2)
        if (len < 2) return ("unknown", -1, -1)
        i += 2 + len
      }
      ("unknown", -1, -1)
    } else ("unknown", -1, -1)
  }

  /** Deterministic REAL-container-header payload for a given format and
    * dimensions — the fixture twin of [[parseImageHeader]]: every byte a
    * parser inspects (magic, field offsets, endianness) is laid out per
    * the public container specs, so `parseImageHeader(synthPayload(f, w,
    * h)) == (f, w, h)` exactly, and the mm2 oracle can replay the
    * generation arithmetic while Spark runs the full bytes→parse path.
    * Checksums/compressed streams are omitted (the header parse never
    * reads them); any other `format` yields a junk payload that must
    * parse as ("unknown", -1, -1). */
  def synthPayload(format: String, w: Int, h: Int): Array[Byte] = {
    def be16(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    format match {
      case "png" =>
        // signature + IHDR chunk (length 13, type, w, h, bit depth/color/
        // compression/filter/interlace) — CRC omitted
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
          be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
          Array[Byte](8, 6, 0, 0, 0)
      case "gif" =>
        // GIF89a + logical screen descriptor (little-endian w, h) + trailer
        "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
          Array[Byte](0, 0, 0x3b)
      case "bmp" =>
        // BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER prefix: size 40,
        // then little-endian signed w at 18 and h at 22
        "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++ le32(54) ++
          le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24)
      case "jpeg" =>
        // SOI + SOF0 segment: marker, length 17, precision, then
        // big-endian HEIGHT before WIDTH (the JPEG field order)
        Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xc0.toByte) ++
          be16(17) ++ Array[Byte](8) ++ be16(h) ++ be16(w) ++
          Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
      case _ => "NOT_A_MEDIA_CONTAINER".getBytes("US-ASCII")
    }
  }

  final case class AudioHeader(
      media_id: Long, format: String, channels: Int, sample_rate: Int)

  /** REAL audio-container header decode (no codec needed — pure byte
    * parsing): WAV walks RIFF chunks to `fmt ` (so files with leading
    * JUNK/LIST chunks still parse) and reads little-endian channels +
    * sample rate; FLAC reads the mandatory first STREAMINFO metadata
    * block's bit-packed fields (20-bit sample rate, 3-bit channels−1).
    * Unknown/truncated payloads → ("unknown", −1, −1). The sample-decode
    * step stays behind [[fakeDecode]], exactly like images. */
  def parseAudioHeader(bytes: Array[Byte]): (String, Int, Int) = {
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
        (u8(i + 3).toLong << 24)) & 0xffffffffL
    @inline def tag(i: Int, s: String): Boolean =
      bytes.length >= i + 4 && (0 until 4).forall(k => u8(i + k) == s.charAt(k))
    val n = bytes.length
    if (tag(0, "RIFF") && n >= 12 && tag(8, "WAVE")) {
      // chunk walk: [id(4) size(4) payload(size, word-aligned)]*; the
      // cursor is a Long — a crafted 32-bit chunk size must land in the
      // "unknown" row, never drive the cursor negative (Int overflow)
      var i = 12L
      while (i + 8 <= n) {
        val size = le32(i.toInt + 4)
        if (tag(i.toInt, "fmt ") && size >= 16 && i + 8 + 8 <= n)
          return ("wav", le16(i.toInt + 10), le32(i.toInt + 12).toInt)
        i += 8 + size + (size & 1) // chunks are 2-byte aligned
      }
      ("unknown", -1, -1)
    } else if (tag(0, "fLaC") && n >= 4 + 4 + 18) {
      // first metadata block must be STREAMINFO (type bits 0-6 of byte 4)
      if ((u8(4) & 0x7f) != 0) return ("unknown", -1, -1)
      val si = 8 // STREAMINFO payload start
      // bytes 10-12 of STREAMINFO: 20-bit sample rate, 3-bit channels-1
      val rate = (u8(si + 10) << 12) | (u8(si + 11) << 4) | (u8(si + 12) >> 4)
      val channels = ((u8(si + 12) >> 1) & 0x7) + 1
      ("flac", channels, rate)
    } else ("unknown", -1, -1)
  }

  /** Deterministic REAL-container audio payload — the fixture twin of
    * [[parseAudioHeader]], mirroring [[synthPayload]] for images: every
    * byte the parser inspects is laid out per the RIFF/WAVE and FLAC
    * specs, so `parseAudioHeader(synthAudioPayload(f, ch, sr)) ==
    * (f, ch, sr)` exactly. The WAV variant deliberately leads with a
    * JUNK chunk so the chunk WALK (not just offset-12 luck) is what the
    * round-trip exercises. */
  def synthAudioPayload(format: String, channels: Int, sampleRate: Int): Array[Byte] = {
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    format match {
      case "wav" =>
        val fmtChunk = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
          le16(1) ++ le16(channels) ++ le32(sampleRate) ++
          le32(sampleRate.toLong * channels * 2) ++
          le16(channels * 2) ++ le16(16)
        val junk = "JUNK".getBytes("US-ASCII") ++ le32(4) ++ Array[Byte](0, 0, 0, 0)
        val data = "data".getBytes("US-ASCII") ++ le32(0)
        val body = "WAVE".getBytes("US-ASCII") ++ junk ++ fmtChunk ++ data
        "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
      case "flac" =>
        // STREAMINFO (34 bytes): min/max block size, min/max frame size,
        // then the bit-packed rate/channels/bits/samples fields
        val si = new Array[Byte](34)
        si(0) = 0x10; si(1) = 0; si(2) = 0x10; si(3) = 0 // block sizes 4096
        si(10) = ((sampleRate >> 12) & 0xff).toByte
        si(11) = ((sampleRate >> 4) & 0xff).toByte
        si(12) = (((sampleRate & 0xf) << 4) | (((channels - 1) & 0x7) << 1)).toByte
        "fLaC".getBytes("US-ASCII") ++
          Array[Byte](0x80.toByte, 0, 0, 34) ++ si // last-block flag + type 0 + len
      case _ => "NOT_AN_AUDIO_CONTAINER".getBytes("US-ASCII")
    }
  }

  final case class VideoHeader(
      media_id: Long, format: String, timescale: Long, duration: Long)

  /** REAL video-container header decode — ISO-BMFF/MP4 box walk (pure
    * byte parsing, big-endian): verify the leading `ftyp` box, walk
    * top-level boxes to `moov`, walk its children to `mvhd`, read
    * timescale and duration (version 0: 32-bit; version 1: 64-bit).
    * 64-bit `largesize` boxes (size field 1) are handled in both walks.
    * Unknown/truncated payloads → ("unknown", −1, −1). Frame decode
    * stays behind [[fakeDecode]], like images and audio. */
  def parseVideoHeader(bytes: Array[Byte]): (String, Long, Long) = {
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    @inline def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    @inline def boxType(i: Int, s: String): Boolean =
      (0 until 4).forall(k => u8(i + 4 + k) == s.charAt(k))
    val n = bytes.length
    if (n < 16 || !boxType(0, "ftyp")) return ("unknown", -1L, -1L)
    // walk [size type payload]* ; size 1 → 64-bit largesize follows type
    def walk(from: Int, until: Int, want: String): Int = {
      var i = from
      while (i + 8 <= until) {
        val size0 = be32(i)
        val (size, hdr) =
          if (size0 == 1L && i + 16 <= until) (be64(i + 8), 16L) else (size0, 8L)
        if (size < hdr || size > until - i) return -1
        if (boxType(i, want)) return i + hdr.toInt
        i += size.toInt
      }
      -1
    }
    val moov = walk(0, n, "moov")
    if (moov < 0) return ("unknown", -1L, -1L)
    val mvhd = walk(moov, n, "mvhd")
    if (mvhd < 0 || mvhd + 4 > n) return ("unknown", -1L, -1L)
    u8(mvhd) match { // version byte
      case 0 if mvhd + 24 <= n =>
        ("mp4", be32(mvhd + 12), be32(mvhd + 16))
      case 1 if mvhd + 32 <= n =>
        ("mp4", be32(mvhd + 20), be64(mvhd + 24))
      case _ => ("unknown", -1L, -1L)
    }
  }

  /** Deterministic REAL ISO-BMFF payload — fixture twin of
    * [[parseVideoHeader]]: ftyp + a decoy `free` box (so the top-level
    * WALK is exercised, like WAV's JUNK) + moov>mvhd with the requested
    * timescale/duration; `version1 = true` emits the 64-bit mvhd. */
  def synthVideoPayload(format: String, timescale: Long, duration: Long,
      version1: Boolean = false): Array[Byte] = {
    def be32(v: Long) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(tp: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tp.getBytes("US-ASCII") ++ payload
    format match {
      case "mp4" =>
        val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0) ++
          "isom".getBytes("US-ASCII"))
        val free = box("free", Array[Byte](0, 0, 0, 0))
        val mvhdPayload =
          if (!version1)
            Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
              be32(timescale) ++ be32(duration) ++ new Array[Byte](80)
          else
            Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
              be32(timescale) ++ be64(duration) ++ new Array[Byte](80)
        ftyp ++ free ++ box("moov", box("mvhd", mvhdPayload))
      case _ => "NOT_A_VIDEO_CONTAINER".getBytes("US-ASCII")
    }
  }

  /** Video header metadata over a binary column — same partition-
    * preserving batch pass as [[imageHeaders]]. */
  def videoHeaders(media: DataFrame): Dataset[VideoHeader] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (fmt, ts, dur) = parseVideoHeader(bytes)
        VideoHeader(id, fmt, ts, dur)
      })
  }

  /** Audio header metadata over a binary column — same partition-
    * preserving batch pass as [[imageHeaders]]. */
  def audioHeaders(media: DataFrame): Dataset[AudioHeader] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (fmt, ch, sr) = parseAudioHeader(bytes)
        AudioHeader(id, fmt, ch, sr)
      })
  }

  /** Header metadata over a binary column via one partition-preserving
    * map pass (same batch shape as [[extractFeatures]]). */
  def imageHeaders(media: DataFrame): Dataset[ImageHeader] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (fmt, w, h) = parseImageHeader(bytes)
        ImageHeader(id, fmt, w, h)
      })
  }

  /** Fallback featurizer for payloads no codec recognizes — a
    * deterministic byte-hash profile with the same signature and batch
    * shape (bytes per row, fixed-size float vector out) as the real
    * decode path ([[realImageFeatures]]). Kept so feature extraction is
    * total over mixed corpora: decodable images go through the real
    * codec, opaque blobs still land in the same feature space. */
  def fakeDecode(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 1125899906842597L // FNV-ish rolling seed
    var i = 0
    while (i < payload.length) {
      h = h * 31 + (payload(i) & 0xff)
      i += 1
      if (i % 7 == 0 || i == payload.length) {
        val d = ((i / 7) min (dims - 1)) max 0
        out(d) = ((h >>> 16) % 1000L).toFloat / 1000.0f
      }
    }
    out
  }

  /** Feature extraction over binary payloads via mapPartitions: one fused
    * per-partition pass (the Scala twin of a Pandas-batch UDF), preserving
    * partitioning — no shuffle. */
  def extractFeatures(media: DataFrame, dims: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaFeatures(id, fakeDecode(bytes, dims))
      })
  }

  /** RESIZE STUB: target-size metadata transform (a real impl re-encodes
    * payload bytes; the fake scales the fake dimensions). */
  def resizeMeta(meta: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    meta.withColumn("resized_width", ceil(col("width") * scale).cast("int"))
      .withColumn("resized_height", ceil(col("height") * scale).cast("int"))
  }

  /** FRAME-SAMPLE STUB: every k-th frame index of a fake n-frame video —
    * the explode shape (one row per sampled frame) is the real contract. */
  def sampleFrames(meta: DataFrame, everyK: Int): DataFrame =
    meta.withColumn("n_frames", (pmod(xxhash64(col("sha")), lit(240L)) + 1).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
      .select(col("media_id"), col("frame_idx"), col("n_frames"))

  // --------------------------------------------------------------------
  // REAL pixel / sample decode — JDK standard-library codecs
  // (javax.imageio, javax.sound.sampled), no external jars.
  // --------------------------------------------------------------------

  /** Deterministic test-pattern image — every channel value is integer
    * arithmetic an oracle can replay:
    *   grayscale: r = g = b = (13x + 7y + id) mod 256  (≤ 256 distinct
    *     colors, so the GIF palette encodes it losslessly);
    *   truecolor: r = (31x + 17y + id) mod 256, g = (7x + 3y + 5·id)
    *     mod 256, b = (x + y + 11·id) mod 256.
    */
  def patternImage(w: Int, h: Int, id: Long, grayscale: Boolean): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb =
          if (grayscale) {
            val v = ((13L * x + 7L * y + id) % 256L).toInt
            (v << 16) | (v << 8) | v
          } else {
            val r = ((31L * x + 17L * y + id) % 256L).toInt
            val g = ((7L * x + 3L * y + 5L * id) % 256L).toInt
            val b = ((x.toLong + y + 11L * id) % 256L).toInt
            (r << 16) | (g << 8) | b
          }
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    img
  }

  /** REAL image encode through the JDK codec (PNG/BMP/GIF/JPEG). */
  def encodeImage(img: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"no JDK writer for '$format'")
    out.toByteArray
  }

  /** REAL image decode through the JDK codec; None when no installed
    * reader recognizes the container. */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    Option(ImageIO.read(new ByteArrayInputStream(bytes)))

  final case class DecodedImage(
      media_id: Long, format: String, width: Long, height: Long,
      n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL pixel-decode statistics over a binary column: one
    * partition-preserving map pass sniffs the container
    * ([[parseImageHeader]]), runs the JDK decoder, and folds per-channel
    * BIGINT pixel sums. Undecodable payloads → ("unknown", −1 dims,
    * zero sums) so the pass is total. The sums are the gate surface: for
    * losslessly-encoded patterns they replay in an oracle bit-for-bit —
    * any codec, offset, or channel-order error breaks the equality. */
  def decodeImageStats(media: DataFrame): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val fmt = parseImageHeader(bytes)._1
        decodeImage(bytes) match {
          case Some(img) =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            DecodedImage(id, fmt, img.getWidth.toLong, img.getHeight.toLong,
              img.getWidth.toLong * img.getHeight, sr, sg, sb)
          case None =>
            DecodedImage(id, "unknown", -1L, -1L, 0L, 0L, 0L, 0L)
        }
      })
  }

  /** REAL nearest-neighbor half resize on DECODED pixels:
    * out(x, y) = in(2x, 2y), output dims ⌈w/2⌉ × ⌈h/2⌉ — deterministic
    * integer index arithmetic (no resampling kernel), so the resized
    * image's pixel sums replay in an oracle as the even-coordinate
    * subset of the source pattern. */
  def resizeHalfNearest(img: BufferedImage): BufferedImage = {
    val rw = (img.getWidth + 1) / 2
    val rh = (img.getHeight + 1) / 2
    val out = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < rh) {
      var x = 0
      while (x < rw) {
        out.setRGB(x, y, img.getRGB(2 * x, 2 * y))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real-decode featurizer: decoded-luminance histogram (`dims` equal
    * bins over 0..255, normalized to sum 1) for decodable images, the
    * [[fakeDecode]] byte profile otherwise — feature extraction stays
    * total over mixed corpora. */
  def realImageFeatures(payload: Array[Byte], dims: Int): Array[Float] =
    decodeImage(payload) match {
      case Some(img) =>
        val counts = new Array[Long](dims)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            // integer ITU-R 601 luma; bin = luma * dims / 256
            val luma = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
              114 * (p & 0xff)) / 1000
            counts((luma * dims) / 256) += 1L
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        counts.map(c => c.toFloat / n)
      case None => fakeDecode(payload, dims)
    }

  /** WAV PCM16 encode — the canonical RIFF/WAVE byte layout written
    * directly (fmt + data chunks, little-endian signed 16-bit,
    * interleaved). Byte-compatible with javax.sound's writer
    * (MultimodalSpec pins BIDIRECTIONAL interop with the JDK codec);
    * written by hand rather than through `AudioSystem.write` because
    * AudioSystem's per-call provider lookup re-scans META-INF/services
    * across the WHOLE classpath — ~1 ms/call under Spark's ~500-jar
    * classloader, which turned this map stage super-linear under
    * parallelism (measured 10× at 4× rows before the rewrite). */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int,
      channels: Int = 1): Array[Byte] = {
    require(channels >= 1, s"channels must be ≥ 1, got $channels")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    @inline def putLe16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    @inline def putLe32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte
      out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    @inline def putTag(i: Int, s: String): Unit = {
      var k = 0
      while (k < 4) { out(i + k) = s.charAt(k).toByte; k += 1 }
    }
    putTag(0, "RIFF"); putLe32(4, 36L + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16L)
    putLe16(20, 1) // PCM
    putLe16(22, channels)
    putLe32(24, sampleRate.toLong)
    putLe32(28, sampleRate.toLong * channels * 2) // byte rate
    putLe16(32, channels * 2) // block align
    putLe16(34, 16) // bits per sample
    putTag(36, "data"); putLe32(40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** WAV PCM16 decode — the RIFF chunk walk ([[parseAudioHeader]]'s
    * discipline) to `fmt ` and `data`, then little-endian sample
    * extraction: sample rate + interleaved PCM16 samples; None when the
    * container is not a PCM16 WAV. Decodes javax.sound-written files
    * byte-for-byte (spec-pinned interop), without AudioSystem's
    * per-call classpath provider scan (see [[encodeWavPcm16]]). */
  def decodeWavPcm16(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
        (u8(i + 3).toLong << 24)) & 0xffffffffL
    @inline def tag(i: Int, s: String): Boolean =
      bytes.length >= i + 4 && (0 until 4).forall(k => u8(i + k) == s.charAt(k))
    val n = bytes.length
    if (!(tag(0, "RIFF") && n >= 12 && tag(8, "WAVE"))) return None
    var (rate, bits, fmtCode) = (-1, -1, -1)
    var data: Option[(Int, Int)] = None // (offset, length)
    // Long cursor: a crafted chunk size near 2^32 must yield the
    // undecodable row (None), not an Int-overflowed negative index
    var i = 12L
    while (i + 8 <= n) {
      val size = le32(i.toInt + 4)
      if (tag(i.toInt, "fmt ") && size >= 16 && i + 8 + 16 <= n) {
        fmtCode = le16(i.toInt + 8); rate = le32(i.toInt + 12).toInt
        bits = le16(i.toInt + 22)
      } else if (tag(i.toInt, "data")) {
        val len = math.min(size, n - i - 8).toInt
        data = Some((i.toInt + 8, len))
      }
      i += 8 + size + (size & 1) // chunks are 2-byte aligned
    }
    if (fmtCode != 1 || bits != 16 || rate <= 0) return None
    data.map { case (off, len) =>
      val samples = new Array[Short](len / 2)
      var k = 0
      while (k < samples.length) {
        samples(k) = ((u8(off + 2 * k)) | (bytes(off + 2 * k + 1) << 8)).toShort
        k += 1
      }
      (rate, samples)
    }
  }

  /** javax.sound twins of [[encodeWavPcm16]]/[[decodeWavPcm16]] — used
    * by the spec to pin BIDIRECTIONAL interop with the real JDK codec
    * (our bytes decode through AudioSystem; AudioSystem's bytes decode
    * through ours). Not for hot paths: AudioSystem's provider lookup
    * scans the classpath per call. */
  def encodeWavPcm16Jdk(samples: Array[Short], sampleRate: Int,
      channels: Int = 1): Array[Byte] = {
    val af = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), af,
      samples.length.toLong / channels)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** See [[encodeWavPcm16Jdk]]. */
  def decodeWavPcm16Jdk(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val f = ais.getFormat
      if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16 || f.isBigEndian) None
      else {
        val raw = ais.readAllBytes()
        val samples = new Array[Short](raw.length / 2)
        var i = 0
        while (i < samples.length) {
          samples(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
          i += 1
        }
        Some((f.getSampleRate.toInt, samples))
      }
    } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }

  final case class DecodedAudio(
      media_id: Long, sample_rate: Long, n_samples: Long,
      sum_s: Long, sum_abs: Long, n_sign_flips: Long)

  /** REAL sample-decode statistics over a binary column — the audio twin
    * of [[decodeImageStats]]: one partition-preserving map pass decodes
    * WAV PCM16 through javax.sound and folds BIGINT sample sum, absolute
    * sum, and strict sign-flip count (consecutive samples with negative
    * product). Undecodable payloads → (−1, 0, 0, 0, 0). */
  def decodeAudioStats(media: DataFrame): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWavPcm16(bytes) match {
          case Some((rate, s)) =>
            var (sum, sabs, flips) = (0L, 0L, 0L)
            var i = 0
            while (i < s.length) {
              sum += s(i); sabs += math.abs(s(i).toLong)
              if (i > 0 && s(i - 1).toLong * s(i) < 0L) flips += 1L
              i += 1
            }
            DecodedAudio(id, rate.toLong, s.length.toLong, sum, sabs, flips)
          case None => DecodedAudio(id, -1L, 0L, 0L, 0L, 0L)
        }
      })
  }
}
