package graft.ext

/** Decoded media metadata: the engine-side contract every codec fills. */
final case class MediaMeta(width: Int, height: Int, format: String, nFrames: Int)

/** Pluggable codec boundary for [[MultimodalOps.decodeMedia]]. Implementations
  * must be serializable — the decoder ships inside the `mapPartitions`
  * closure to executors. Two implementations ride along:
  *
  *  - [[ImageHeaderDecoder]] — a REAL pure-JVM codec: parses PNG / JPEG /
  *    GIF / BMP headers (dimensions, format, GIF frame count) straight off
  *    the bytes, no image library needed.
  *  - [[FakeDecoder]] — the deterministic test stand-in for payloads that
  *    aren't real media (the driver's documents table), kept as the
  *    oracle-checked default so the Spark-side plumbing is exercised
  *    end-to-end in an environment with no media fixtures.
  *
  * Production media (full pixel decode, audio, video) plugs in the same
  * way: implement `decode`, pass the instance to `decodeMedia`.
  */
trait MediaDecoder extends Serializable {
  def decode(bytes: Array[Byte]): MediaMeta
}

/** Deterministic stand-in for payloads that aren't real media. The format
  * branch keys off the first CHARACTER's Unicode code point (not the first
  * UTF-8 byte) so it agrees with character-level SQL
  * (`ascii(substr(text,1,1))`) even when the payload starts with a
  * multi-byte character (zh docs).
  */
object FakeDecoder extends MediaDecoder {
  override def decode(bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length
    val head =
      if (len == 0) 0
      else new String(bytes, 0, math.min(len, 4),
        java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
    MediaMeta(
      width = 64 + (len % 576),          // plausible 64..639
      height = 64 + ((len * 7) % 416),   // plausible 64..479
      format = if (head % 2 == 0) "png" else "jpeg",
      nFrames = 1 + (len % 8))
  }
}

/** Real pure-JVM image header parser: PNG (IHDR), JPEG (SOF marker walk),
  * GIF (logical screen descriptor + block-walk frame count), BMP
  * (BITMAPINFOHEADER). Unknown payloads decode as `format = "unknown"`
  * with zero dimensions rather than throwing — a corrupt byte blob in row
  * 10⁹ of a 100 TB scan must not kill the job; filter on format instead.
  */
object ImageHeaderDecoder extends MediaDecoder {

  override def decode(bytes: Array[Byte]): MediaMeta = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val n = bytes.length

    // PNG: 8-byte signature, then the IHDR chunk (length+type+13 bytes)
    if (n >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        bytes.slice(12, 16).sameElements("IHDR".getBytes)) {
      MediaMeta(be32(16), be32(20), "png", 1)
    }
    // JPEG: SOI then marker segments; dimensions live in the first SOFn
    else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var out: MediaMeta = null
      while (out == null && i + 3 < n) {
        if (u8(i) != 0xff) { i += 1 } // padding / garbage between markers
        else {
          val marker = u8(i + 1)
          if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2 // standalone
          else if (i + 3 >= n) i = n
          else {
            val segLen = be16(i + 2)
            // SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if (marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
              if (i + 8 < n) out = MediaMeta(be16(i + 7), be16(i + 5), "jpeg", 1)
              else i = n
            } else i += 2 + segLen
          }
        }
      }
      if (out != null) out else unknown(n)
    }
    // GIF: header + logical screen descriptor; frames = image descriptors
    else if (n >= 13 && bytes.slice(0, 3).sameElements("GIF".getBytes)) {
      val width = le16(6)
      val height = le16(8)
      var frames = 0
      var i = 13
      if ((u8(10) & 0x80) != 0) i += 3 * (2 << (u8(10) & 0x07)) // global color table
      var done = false
      while (!done && i < n) {
        u8(i) match {
          case 0x3b => done = true // trailer
          case 0x21 => // extension: label byte, then data sub-blocks
            i += 2
            while (i < n && u8(i) != 0) i += 1 + u8(i)
            i += 1
          case 0x2c => // image descriptor
            frames += 1
            if (i + 9 < n && (u8(i + 9) & 0x80) != 0)
              i += 3 * (2 << (u8(i + 9) & 0x07)) // local color table
            i += 10 + 1 // descriptor + LZW min code size
            while (i < n && u8(i) != 0) i += 1 + u8(i)
            i += 1
          case _ => done = true // corrupt block stream: stop, keep what we have
        }
      }
      MediaMeta(width, height, "gif", math.max(frames, 1))
    }
    // BMP: "BM", BITMAPINFOHEADER at offset 14 (signed width/height)
    else if (n >= 26 && u8(0) == 'B' && u8(1) == 'M') {
      MediaMeta(math.abs(le32(18)), math.abs(le32(22)), "bmp", 1)
    }
    else unknown(n)
  }

  private def unknown(len: Int): MediaMeta = MediaMeta(0, 0, "unknown", 1)
}

/** Decoded audio metadata: the audio-side contract every codec fills.
  * `nSamples` is per channel; duration derives as nSamples / sampleRate.
  */
final case class AudioMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nSamples: Long, format: String)

/** Pluggable audio codec boundary for [[MultimodalOps.decodeAudio]] —
  * same shipping rules as [[MediaDecoder]] (serializable, rides in the
  * mapPartitions closure).
  */
trait AudioDecoder extends Serializable {
  def decode(bytes: Array[Byte]): AudioMeta
}

/** Real pure-JVM audio header parser: WAV (RIFF chunk walk — fmt and data
  * chunks give rate/channels/bits and the exact sample count) and MPEG-1
  * Layer III (frame-header walk: rate/channels from the first frame,
  * sample count = 1152 × counted frames; an ID3v2 tag is skipped by its
  * syncsafe size). Unknown or corrupt payloads decode as
  * `format = "unknown"` with zeros rather than throwing — same
  * never-kill-the-scan contract as [[ImageHeaderDecoder]].
  */
object AudioHeaderDecoder extends AudioDecoder {

  override def decode(bytes: Array[Byte]): AudioMeta = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3).toLong << 24)) & 0xffffffffL
    val n = bytes.length

    // WAV: "RIFF" <size> "WAVE", then id/size chunks
    if (n >= 12 && bytes.slice(0, 4).sameElements("RIFF".getBytes) &&
        bytes.slice(8, 12).sameElements("WAVE".getBytes)) {
      var i = 12
      var rate = 0; var ch = 0; var bits = 0; var blockAlign = 0
      var dataLen = -1L
      var walking = true
      while (walking && i + 8 <= n && (dataLen < 0 || rate == 0)) {
        val id = new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val sz = le32(i + 4)
        if (id == "fmt " && i + 24 <= n) {
          ch = le16(i + 10); rate = le32(i + 12).toInt
          blockAlign = le16(i + 20); bits = le16(i + 22)
        } else if (id == "data") dataLen = math.min(sz, (n - i - 8).toLong)
        // word-aligned advance in LONG space: a corrupt 4 GiB chunk size
        // must stop the walk, never wrap the offset negative
        val next = i.toLong + 8L + sz + (sz & 1L)
        if (next <= i || next > n) walking = false else i = next.toInt
      }
      if (rate <= 0 || ch <= 0 || blockAlign <= 0 || dataLen < 0) unknown
      else AudioMeta(rate, ch, bits, dataLen / blockAlign, "wav")
    }
    // MPEG-1 Layer III: optional ID3v2, then 0xFFE-sync frame headers
    else {
      var i = 0
      if (n >= 10 && bytes.slice(0, 3).sameElements("ID3".getBytes))
        i = 10 + ((u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)) // syncsafe
      if (i + 4 > n || u8(i) != 0xff || (u8(i + 1) & 0xfe) != 0xfa) unknown
      else {
        // 0xfa/0xfb = MPEG-1 Layer III (with/without CRC)
        val rates = Array(44100, 48000, 32000)
        val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
        val rIdx = (u8(i + 2) >> 2) & 0x3
        val bIdx = (u8(i + 2) >> 4) & 0xf
        if (rIdx > 2 || bIdx == 0 || bIdx == 15) unknown
        else {
          val rate = rates(rIdx)
          val channels = if (((u8(i + 3) >> 6) & 0x3) == 3) 1 else 2
          var frames = 0L
          var ok = true
          while (ok && i + 4 <= n) {
            if (u8(i) != 0xff || (u8(i + 1) & 0xfe) != 0xfa) ok = false
            else {
              val bi = (u8(i + 2) >> 4) & 0xf
              val ri = (u8(i + 2) >> 2) & 0x3
              val pad = (u8(i + 2) >> 1) & 0x1
              if (bi == 0 || bi == 15 || ri > 2) ok = false
              else { frames += 1; i += 144 * kbps(bi) * 1000 / rates(ri) + pad }
            }
          }
          AudioMeta(rate, channels, 0, frames * 1152L, "mp3")
        }
      }
    }
  }

  private def unknown: AudioMeta = AudioMeta(0, 0, 0, 0L, "unknown")
}

/** Pluggable resize boundary for [[MultimodalOps.resizeMedia]] — binary in,
  * binary out, same shipping rules as [[MediaDecoder]]. A production
  * implementation wraps a real codec (JNI/imageio) and re-encodes at the
  * target dimensions; [[FakeResizer]] is the deterministic stand-in that
  * keeps the Spark-side contract — binary transport both ways, partition
  * iteration, metadata stamping — exercised and oracle-checked in an
  * environment with no media libraries.
  */
trait MediaResizer extends Serializable {
  def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte]
}

/** Deterministic stand-in resize: output length is the pure function
  * ((len + width·height) % 977) + 16 (977 prime keeps lengths
  * input-varying), content a reproducible byte ramp seeded by the inputs
  * — same payload and target always yield identical bytes, so resized
  * columns dedup/fingerprint deterministically downstream.
  */
object FakeResizer extends MediaResizer {
  override def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val outLen = ((bytes.length + width * height) % 977) + 16
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = ((bytes.length * 31 + width * 7 + height * 3 + i) & 0xff).toByte
      i += 1
    }
    out
  }
}

/** Pluggable embedding boundary for [[MultimodalOps.extractFeatures]] —
  * binary payload to a fixed-dim float vector (the image/audio encoder
  * step of a multimodal curation pipeline; the output column feeds the
  * ANN / semantic-dedup family directly). Production plugs an ONNX/JNI
  * encoder here, batching inside the partition iterator;
  * [[FakeFeatureExtractor]] is the deterministic stand-in.
  */
trait FeatureExtractor extends Serializable {
  def extract(bytes: Array[Byte], dim: Int): Array[Float]
}

/** Deterministic stand-in features: f_i = ((((len · (i+1)) mod 100003) ·
  * 2654435761) mod 1024) / 1024 — exactly representable in float32
  * (k/1024, k < 1024), so the vector is bit-stable across engines and
  * replayable in the oracle from the payload's byte length alone. The
  * inner mod (100003 prime) bounds the product at ~2.7e14, so the Long
  * arithmetic can never overflow (a silent JVM wraparound would diverge
  * from an ANSI engine's overflow error).
  */
object FakeFeatureExtractor extends FeatureExtractor {
  override def extract(bytes: Array[Byte], dim: Int): Array[Float] = {
    val len = bytes.length.toLong
    Array.tabulate(dim)(i =>
      ((len * (i + 1) % 100003L) * 2654435761L % 1024L) / 1024.0f)
  }
}
