package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the
  * pipeline as opaque `binary` payloads with typed metadata, processed
  * by per-partition batch functions over a typed `Dataset`.
  *
  * The IMAGE decode path is real: the JDK ships PNG/BMP/GIF/JPEG codecs
  * (`javax.imageio`), so `kind = "image"` payloads that parse as one of
  * those formats report their actual pixel dimensions. AUDIO and VIDEO
  * container metadata is also real: WAV/RIFF headers
  * ([[tryDecodeWav]] — sample rate, channels, bits, duration from the
  * fmt/data chunk walk) and MP4 `moov` boxes ([[tryDecodeMp4]] —
  * timescale/duration from `mvhd`, frame count from the
  * `trak/mdia/minf/stbl/stsz` sample table). Both are header-only
  * walks of public, dependency-free formats (RIFF 1991, ISO 14496-12)
  * in pure JVM — no sample data is ever decoded. Only a payload that
  * matches NO known container falls back to the clearly-marked stub:
  * deterministic fake metadata derived from the payload length, so
  * tests and the SQL oracle can still verify the plumbing end-to-end.
  * Everything around the kernel is the real scale design:
  *  - payloads stay in executor memory as byte arrays, never in driver
  *    memory, never stringified;
  *  - `mapPartitions` gives the decode library one JVM-local batch per
  *    partition (the Scala analog of a vectorized Python UDF batch);
  *  - metadata is columnar next to the blob, so filters on
  *    width/kind/bytes prune BEFORE any decode runs;
  *  - partition sizing: payload-bearing tables want
  *    `spark.sql.files.maxPartitionBytes` tuned down so a partition of
  *    blobs fits executor memory (documented, not hard-coded).
  */
object Multimodal {

  // ImageIO's DEFAULT stream cache is disk-backed: every
  // ImageIO.read(InputStream) / ImageIO.write(img, fmt, OutputStream)
  // creates a temp FILE, so each image decode/encode pays executor-
  // local disk I/O — measured 2.4× wall on q111's 5000-image workload
  // on a slow-/tmp box (2717 ms vs 1115 ms in-memory; the r12→r13
  // q111 regression). Every payload here is an in-memory byte array
  // already bounded by the [[MaxDecodePixels]] budget check, so the
  // memory-backed cache is strictly better at any scale. Runs in the
  // object initializer: every decode lambda calls through this
  // object, so executors flip the flag before their first decode.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, frames: Int)

  /** Build a media table from a text corpus for exercising the
    * plumbing: payload = UTF-8 bytes, kind round-robins by id. */
  def mediaFromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Largest per-side pixel dimension accepted from an image header.
    * A header is attacker-controlled: a few hundred payload bytes can
    * DECLARE 60000×60000. We never allocate pixel buffers (see below),
    * but downstream consumers trust width*height for batch sizing, so
    * implausible declarations take the stub path instead. */
  private val MaxImageDim = 16384

  /** Executor-side image dimension probe via the JDK's ImageIO
    * (PNG/BMP/GIF/JPEG): actual (width, height) from the HEADER ONLY,
    * or None when no installed reader accepts the bytes.
    *
    * Header-only matters for untrusted payloads: `ImageIO.read` would
    * allocate the full W*H pixel buffer just to report dimensions, and
    * a crafted header declaring huge dimensions turns that into an
    * OutOfMemoryError — which NonFatal does NOT catch, killing the
    * Spark task. `reader.getWidth/getHeight(0)` parse only header
    * fields; a dimension cap rejects implausible declarations on top.
    * MemoryCacheImageInputStream keeps the probe fully in-memory —
    * ImageIO's default stream otherwise spills a disk-cache temp file
    * per payload on executors.
    *
    * NonFatal (not just IOException): JDK readers CLAIM formats from a
    * short magic ("BM"…) and then parse garbage as header fields,
    * throwing ArrayIndexOutOfBounds / NegativeArraySize and friends on
    * malformed input. Any such payload must fall back to the stub, not
    * fail the Spark task. */
  private def tryDecodeImage(bytes: Array[Byte]): Option[(Int, Int)] = {
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(in, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w > 0 && h > 0 && w <= MaxImageDim && h <= MaxImageDim)
            Some((w, h))
          else None
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally in.close()
  }

  // ----------------------------------------------------------------
  // Audio/video container parsing — header-only, pure JVM, untrusted-
  // input discipline throughout: every multi-byte read is bounds-
  // checked, declared sizes are clamped to the actual payload, and any
  // structural violation returns None (stub fallback) rather than
  // throwing into the Spark task.

  /** Parsed WAV metadata: all fields straight from the fmt chunk; the
    * duration is arithmetic over header fields + the data-chunk SIZE
    * (`frames = data_bytes / block_align`, `ms = frames·1000 / rate`) —
    * no sample ever read. */
  final case class WavMeta(
      sampleRate: Int, channels: Int, bitsPerSample: Int, durationMs: Long)

  /** Parsed MP4 metadata: movie timescale/duration from `moov/mvhd`
    * (version 0 and 1 layouts), sample (frame) count from the first
    * `moov/trak/mdia/minf/stbl/stsz` box when present (0 otherwise). */
  final case class Mp4Meta(timescale: Long, durationMs: Long, frames: Int)

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u64be(b: Array[Byte], i: Int): Long =
    (u32be(b, i) << 32) | u32be(b, i + 4)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** WAV/RIFF header probe: `RIFF….WAVE` then a chunk walk collecting
    * `fmt ` (audio format fields) and `data` (payload size). Chunks are
    * word-aligned (odd sizes carry a pad byte). Returns None unless
    * both chunks are present with plausible fields — sample rate in
    * [1, 10⁷], 1–64 channels, positive block align. A declared data
    * size past the actual payload is clamped (truncated files report
    * the duration of the bytes that exist). */
  def tryDecodeWav(bytes: Array[Byte]): Option[WavMeta] =
    try {
      if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
        None
      else {
        var i = 12
        var fmt: Option[(Int, Int, Int, Int)] = None // (rate, ch, bits, align)
        var dataBytes = -1L
        while (i + 8 <= bytes.length && (fmt.isEmpty || dataBytes < 0)) {
          val id = tag(bytes, i)
          val size = u32le(bytes, i + 4)
          val body = i + 8
          if (id == "fmt " && size >= 16 && body + 16 <= bytes.length) {
            val channels = u16le(bytes, body + 2)
            val rate = u32le(bytes, body + 4)
            val align = u16le(bytes, body + 12)
            val bits = u16le(bytes, body + 14)
            if (channels >= 1 && channels <= 64 &&
                rate >= 1 && rate <= 10000000 && align >= 1)
              fmt = Some((rate.toInt, channels, bits, align))
          } else if (id == "data") {
            dataBytes = math.min(size, (bytes.length - body).toLong)
          }
          i = body + size.toInt + (size.toInt & 1) // word-aligned chunks
          if (size > Int.MaxValue - 16) i = bytes.length // malformed size: stop
        }
        fmt.collect { case (rate, ch, bits, align) if dataBytes >= 0 =>
          WavMeta(rate, ch, bits, (dataBytes / align) * 1000L / rate)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decoded PCM sample statistics: everything integer-exact so a SQL
    * oracle recomputes them from the generating parameters —
    * `n_samples` counts samples across channels, `peak` =
    * max |amplitude|, `clipped` = samples pinned at the type's rails,
    * `sum_abs`/`sum_sq` are the fixed-point loudness aggregates
    * (RMS² = sum_sq / n — left as the exact integer numerator; the
    * caller takes the root if it wants dB). */
  final case class WavPcm(sample_rate: Int, channels: Int, bits: Int,
      n_samples: Long, peak: Long, clipped: Long, sum_abs: Long,
      sum_sq: Long)

  /** REAL WAV PCM decode — the one a/v codec whose "decode" is the
    * container's own byte layout (integer PCM behind the RIFF header
    * [[tryDecodeWav]] already walks), so it ships decoded for real
    * with zero dependencies; MP3/MP4 payload decode stays the honest
    * stub ([[decodeStub]]). Same untrusted-input discipline as every
    * probe: bounds-checked reads, declared sizes clamped to the
    * payload, structural violations → None. Supports format 1 (integer
    * PCM) at 8 (unsigned, rebased to signed around 128), 16, 24 and
    * 32 bits (signed little-endian); trailing bytes short of one full
    * sample are ignored. Overflow honesty: `sum_sq` is exact in a
    * Long for ≥16-bit audio up to ~10⁹ samples per file (hours at
    * 48 kHz) — beyond that, window the file upstream. */
  /** The parsed integer-PCM layout behind [[decodeWavPcm]] and
    * [[pcmWindowEnergy]]: `(rate, channels, bits, dataOff, nSamples)`
    * after the full untrusted-input chunk walk — None on anything
    * structurally unsound or non-integer-PCM. */
  private def parsePcmLayout(
      bytes: Array[Byte]): Option[(Int, Int, Int, Int, Long)] = {
    if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      None
    else {
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None // (rate, ch, bits)
      var pcm = false
      var dataOff = -1
      var dataLen = -1L
      while (i + 8 <= bytes.length && (fmt.isEmpty || dataOff < 0)) {
        val id = tag(bytes, i)
        val size = u32le(bytes, i + 4)
        val body = i + 8
        if (id == "fmt " && size >= 16 && body + 16 <= bytes.length) {
          val format = u16le(bytes, body)
          val channels = u16le(bytes, body + 2)
          val rate = u32le(bytes, body + 4)
          val bits = u16le(bytes, body + 14)
          pcm = format == 1
          if (channels >= 1 && channels <= 64 &&
              rate >= 1 && rate <= 10000000 &&
              (bits == 8 || bits == 16 || bits == 24 || bits == 32))
            fmt = Some((rate.toInt, channels, bits))
        } else if (id == "data") {
          dataOff = body
          dataLen = math.min(size, (bytes.length - body).toLong)
        }
        i = body + size.toInt + (size.toInt & 1) // word-aligned chunks
        if (size > Int.MaxValue - 16) i = bytes.length // malformed: stop
      }
      fmt.collect { case (rate, ch, bits) if pcm && dataOff >= 0 =>
        (rate, ch, bits, dataOff, dataLen / (bits / 8))
      }
    }
  }

  /** Sample `s`'s signed amplitude (8-bit rebased around 128; 16/24/32
    * signed little-endian). */
  private def pcmSample(bytes: Array[Byte], dataOff: Int, bits: Int,
      s: Long): Long = {
    val o = dataOff + (s * (bits / 8)).toInt
    bits match {
      case 8 => (bytes(o) & 0xff).toLong - 128L
      case 16 =>
        (((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort).toLong
      case 24 =>
        val v = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
          (bytes(o + 2) << 16)
        v.toLong
      case _ =>
        ((bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) |
          (bytes(o + 3).toLong << 24))
    }
  }

  def decodeWavPcm(bytes: Array[Byte]): Option[WavPcm] =
    try parsePcmLayout(bytes).map { case (rate, ch, bits, dataOff, n) =>
      val (railLo, railHi) =
        if (bits == 8) (-128L, 127L)
        else (-(1L << (bits - 1)), (1L << (bits - 1)) - 1)
      var peak = 0L; var clipped = 0L; var sumAbs = 0L; var sumSq = 0L
      var s = 0L
      while (s < n) {
        val amp = pcmSample(bytes, dataOff, bits, s)
        val a = math.abs(amp)
        if (a > peak) peak = a
        if (amp == railLo || amp == railHi) clipped += 1
        sumAbs += a; sumSq += amp * amp
        s += 1
      }
      WavPcm(rate, ch, bits, n, peak, clipped, sumAbs, sumSq)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fixed-window energy segmentation over the REAL decoded samples —
    * the gate a training pipeline actually runs on decoded audio
    * (silence trimming / voice-activity-ish admission), all integer
    * arithmetic so a SQL oracle recomputes it exactly. Window `w`
    * covers samples `[w*window, min((w+1)*window, n))` (the last
    * window may be short); a window is ACTIVE iff its energy exceeds
    * the per-sample threshold on its OWN length — `sum_sq >
    * threshold * n_w`, strict, so the short tail window is judged by
    * the same mean-square bar as full ones, not by a diluted absolute
    * one. `first_active`/`last_active` are -1 on an all-silent file
    * (trim everything); `voiced_samples`/`voiced_sum_sq` aggregate
    * the active windows only. */
  final case class PcmWindows(sample_rate: Int, channels: Int, bits: Int,
      n_samples: Long, n_windows: Int, active_windows: Int,
      first_active: Int, last_active: Int, voiced_samples: Long,
      voiced_sum_sq: Long)

  def pcmWindowEnergy(bytes: Array[Byte], window: Int,
      threshold: Long): Option[PcmWindows] = {
    require(window >= 1, s"need window >= 1, got $window")
    require(threshold >= 0, s"need threshold >= 0, got $threshold")
    try parsePcmLayout(bytes).map { case (rate, ch, bits, dataOff, n) =>
      var w = 0; var active = 0; var first = -1; var last = -1
      var voiced = 0L; var voicedSq = 0L
      var s = 0L
      while (s < n) {
        val end = math.min(s + window, n)
        val nw = end - s
        var sumSq = 0L
        var j = s
        while (j < end) {
          val amp = pcmSample(bytes, dataOff, bits, j)
          sumSq += amp * amp
          j += 1
        }
        if (sumSq > threshold * nw) {
          active += 1
          if (first < 0) first = w
          last = w
          voiced += nw; voicedSq += sumSq
        }
        w += 1
        s = end
      }
      PcmWindows(rate, ch, bits, n, w, active, first, last, voiced,
        voicedSq)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Parsed MP3 metadata: fields of the FIRST frame header plus a
    * whole-file frame walk — `frames` complete frames found,
    * `durationMs` from the accumulated per-frame sample counts
    * (1152 samples/frame for MPEG1 Layer III, 576 for MPEG2/2.5).
    * Header-only: frame PAYLOADS are skipped via the computed frame
    * length, never decoded. */
  final case class Mp3Meta(
      sampleRate: Int, channels: Int, bitrateKbps: Int, frames: Int,
      durationMs: Long)

  /** Parsed FLAC STREAMINFO (exact, not estimated): the 34-byte
    * mandatory first metadata block carries sample rate (20 bits),
    * channels (3), bits/sample (5), and total samples (36) — duration
    * is exact arithmetic, no estimate needed. */
  final case class FlacMeta(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, durationMs: Long)

  // MPEG1 / MPEG2(&2.5) Layer III bitrate tables (kbps, index 1–14;
  // 0 = free, 15 = bad) and sample-rate tables per version — public
  // constants from ISO 11172-3 / 13818-3.
  private val Mp3BitrateV1 = Array(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mp3BitrateV2 = Array(
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  private val Mp3RateV1 = Array(44100, 48000, 32000)
  private val Mp3RateV2 = Array(22050, 24000, 16000)
  private val Mp3RateV25 = Array(11025, 12000, 8000)

  /** Decode one 4-byte MP3 (Layer III) frame header at `i`:
    * (sampleRate, channels, bitrateKbps, samplesPerFrame, frameLen).
    * None unless the sync bits, version, layer, bitrate index, and
    * sample-rate index are all valid. */
  private def mp3FrameHeader(b: Array[Byte], i: Int): Option[(Int, Int, Int, Int, Int)] = {
    if (i + 4 > b.length) return None
    val b0 = b(i) & 0xff; val b1 = b(i + 1) & 0xff
    val b2 = b(i + 2) & 0xff; val b3 = b(i + 3) & 0xff
    if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return None
    val version = (b1 >> 3) & 3 // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    val layer = (b1 >> 1) & 3   // 1=Layer III
    if (version == 1 || layer != 1) return None
    val bitrateIdx = (b2 >> 4) & 15
    val rateIdx = (b2 >> 2) & 3
    val padding = (b2 >> 1) & 1
    if (bitrateIdx < 1 || bitrateIdx > 14 || rateIdx == 3) return None
    val kbps =
      if (version == 3) Mp3BitrateV1(bitrateIdx) else Mp3BitrateV2(bitrateIdx)
    val rate = version match {
      case 3 => Mp3RateV1(rateIdx)
      case 2 => Mp3RateV2(rateIdx)
      case _ => Mp3RateV25(rateIdx)
    }
    val samplesPerFrame = if (version == 3) 1152 else 576
    // Layer III frame length: spf/8 · bitrate / rate + padding
    val frameLen = samplesPerFrame / 8 * (kbps * 1000) / rate + padding
    val channels = if (((b3 >> 6) & 3) == 3) 1 else 2 // mode 11 = mono
    if (frameLen < 4) None
    else Some((rate, channels, kbps, samplesPerFrame, frameLen))
  }

  /** Declared (frames, bytes) totals from a Xing/"Info" or VBRI
    * header inside the FIRST frame, or None when neither is present.
    *
    *  - Xing/Info sits right after the side info (MPEG1: 32 bytes
    *    stereo / 17 mono; MPEG2/2.5: 17 / 9): tag(4) + flags(4),
    *    then optional frames(4) and bytes(4) gated by flag bits 0/1.
    *    A Xing header without the frame-count flag declares nothing
    *    useful here → None (fall back to the walk).
    *  - VBRI (Fraunhofer) sits at a FIXED 32 bytes past the 4-byte
    *    frame header: tag(4) + version(2) + delay(2) + quality(2) +
    *    bytes(4) + frames(4).
    *
    * Every read is bounds-checked against BOTH the payload and the
    * first frame's extent — the same discipline as the box walks; a
    * declared count outside (0, MaxSamples] is rejected. The frame
    * count is taken as the duration-bearing audio-frame total (the
    * convention players apply when seeking). */
  private def mp3VbrHeader(b: Array[Byte], start: Int, mpeg1: Boolean,
      mono: Boolean, frameLen: Int): Option[(Int, Option[Long])] = {
    val end = math.min(start.toLong + frameLen, b.length.toLong).toInt
    def tagAt(i: Int, t: String): Boolean =
      i >= 0 && i + 4 <= end &&
        (0 until 4).forall(j => b(i + j) == t.charAt(j).toByte)
    def u32(i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    val sideInfo =
      if (mpeg1) { if (mono) 17 else 32 } else { if (mono) 9 else 17 }
    val xi = start + 4 + sideInfo
    val vi = start + 36
    if (tagAt(xi, "Xing") || tagAt(xi, "Info")) {
      if (xi + 8 > end) None
      else {
        val flags = u32(xi + 4)
        if ((flags & 1) == 0 || xi + 12 > end) None
        else {
          val frames = u32(xi + 8)
          val bytesF =
            if ((flags & 2) != 0 && xi + 16 <= end) Some(u32(xi + 12)) else None
          if (frames >= 1 && frames <= MaxSamples)
            Some((frames.toInt, bytesF.filter(_ > 0)))
          else None
        }
      }
    } else if (tagAt(vi, "VBRI")) {
      if (vi + 18 > end) None
      else {
        val frames = u32(vi + 14)
        if (frames >= 1 && frames <= MaxSamples)
          Some((frames.toInt, Some(u32(vi + 10)).filter(_ > 0)))
        else None
      }
    } else None
  }

  /** MP3 probe: skip an optional leading ID3v2 tag (synchsafe size),
    * then read the first Layer III frame header. A Xing/Info or VBRI
    * header in that first frame ([[mp3VbrHeader]]) short-circuits the
    * probe to O(1): the DECLARED frame count gives frames and
    * duration, and the declared byte total gives the average bitrate
    * — no walk, which at corpus scale means only the stream head is
    * ever fetched, and on VBR streams the average bitrate replaces
    * the misleading first-frame bitrate. Otherwise the whole stream
    * is walked — each frame's length computed from its own header
    * (so un-headered VBR still walks correctly), payloads skipped,
    * never decoded. The walk counts COMPLETE frames only (a
    * truncated trailing frame stops it — same clamp discipline as
    * [[tryDecodeWav]]) and requires every frame to agree on the
    * sample rate. */
  def tryDecodeMp3(bytes: Array[Byte]): Option[Mp3Meta] =
    try {
      var i = 0
      // ID3v2: "ID3" + version(2) + flags(1) + synchsafe size(4)
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
          bytes(2) == '3' && (4 to 9).forall(j => (bytes(j) & 0x80) == 0)) {
        val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
          ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
        i = math.min(10L + sz, bytes.length.toLong).toInt
      }
      mp3FrameHeader(bytes, i).flatMap {
        case (rate, channels, kbps, spf0, flen0) =>
          mp3VbrHeader(bytes, i, mpeg1 = spf0 == 1152,
              mono = channels == 1, frameLen = flen0) match {
            case Some((declared, declaredBytes)) =>
              val durationMs = declared.toLong * spf0 * 1000L / rate
              val avgKbps = declaredBytes
                .filter(_ => durationMs > 0)
                .map(by => ((by * 8) / durationMs).toInt)
                .filter(_ > 0)
                .getOrElse(kbps)
              Some(Mp3Meta(rate, channels, avgKbps, declared, durationMs))
            case None =>
              var frames = 0
              var samples = 0L
              var ok = true
              while (ok) {
                mp3FrameHeader(bytes, i) match {
                  case Some((r, _, _, spf, flen))
                      if r == rate && i + flen <= bytes.length =>
                    frames += 1; samples += spf; i += flen
                  case _ => ok = false
                }
              }
              if (frames < 1) None
              else Some(Mp3Meta(rate, channels, kbps, frames,
                samples * 1000L / rate))
          }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** FLAC probe: `fLaC` magic, then the metadata-block walk — 1-byte
    * header (last-flag + type) and 24-bit length per block — reading
    * the mandatory STREAMINFO (type 0, ≥34 bytes): sample rate
    * (20 bits), channels−1 (3), bits−1 (5), total samples (36),
    * unpacked exactly. No frame is ever decoded; duration is exact
    * arithmetic over header fields. */
  def tryDecodeFlac(bytes: Array[Byte]): Option[FlacMeta] =
    try {
      if (bytes.length < 8 || tag(bytes, 0) != "fLaC") None
      else {
        var i = 4
        var out: Option[FlacMeta] = None
        var last = false
        while (!last && out.isEmpty && i + 4 <= bytes.length) {
          val hdr = bytes(i) & 0xff
          last = (hdr & 0x80) != 0
          val blockType = hdr & 0x7f
          val len = ((bytes(i + 1) & 0xff) << 16) |
            ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
          val body = i + 4
          if (body + len > bytes.length) last = true // truncated: stop
          else if (blockType == 0 && len >= 34) {
            val b10 = bytes(body + 10) & 0xff; val b11 = bytes(body + 11) & 0xff
            val b12 = bytes(body + 12) & 0xff; val b13 = bytes(body + 13) & 0xff
            val rate = (b10 << 12) | (b11 << 4) | (b12 >> 4)
            val channels = ((b12 >> 1) & 7) + 1
            val bps = (((b12 & 1) << 4) | (b13 >> 4)) + 1
            val totalSamples = ((b13 & 0x0fL) << 32) |
              ((bytes(body + 14) & 0xffL) << 24) |
              ((bytes(body + 15) & 0xffL) << 16) |
              ((bytes(body + 16) & 0xffL) << 8) | (bytes(body + 17) & 0xffL)
            if (rate > 0)
              out = Some(FlacMeta(rate, channels, bps, totalSamples,
                totalSamples * 1000L / rate))
          }
          i = body + len
        }
        out
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Find an ISO-BMFF box by path (e.g. `moov/mvhd`) inside
    * `bytes[from, until)`: returns the BODY range of the first match.
    * Handles 64-bit (`size == 1`) and to-end-of-enclosure
    * (`size == 0`) box sizes; stops on any size that violates the
    * enclosing range. */
  private def findBox(bytes: Array[Byte], from: Int, until: Int,
      path: List[String]): Option[(Int, Int)] = path match {
    case Nil => Some((from, until))
    case name :: rest =>
      var i = from
      while (i + 8 <= until) {
        val declared = u32be(bytes, i)
        val boxType = tag(bytes, i + 4)
        val (headerLen, size): (Int, Long) =
          if (declared == 1 && i + 16 <= until) (16, u64be(bytes, i + 8))
          else if (declared == 0) (8, (until - i).toLong)
          else (8, declared)
        if (size < headerLen || i + size > until) return None // malformed
        if (boxType == name)
          return findBox(bytes, i + headerLen, i + size.toInt, rest)
        i += size.toInt
      }
      None
  }

  /** All sibling boxes named `name` in `bytes[from, until)` as body
    * ranges — the multi-match complement of [[findBox]] (real MP4s
    * carry several `trak` siblings; the first is often audio). */
  private def findBoxes(bytes: Array[Byte], from: Int, until: Int,
      name: String): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var i = from
    var ok = true
    while (ok && i + 8 <= until) {
      val declared = u32be(bytes, i)
      val boxType = tag(bytes, i + 4)
      val (headerLen, size): (Int, Long) =
        if (declared == 1 && i + 16 <= until) (16, u64be(bytes, i + 8))
        else if (declared == 0) (8, (until - i).toLong)
        else (8, declared)
      if (size < headerLen || i + size > until) ok = false // malformed
      else {
        if (boxType == name) out += ((i + headerLen, i + size.toInt))
        i += size.toInt
      }
    }
    out.result()
  }

  /** One sample's TRUE byte range inside the container file, from the
    * MP4 sample tables: `offset` is file-absolute (stco/co64 chunk
    * offset + intra-chunk prefix of sizes), `size` from the stsz
    * table. */
  final case class SampleRange(offset: Long, size: Long)

  /** Allocation bound for untrusted sample tables: a 12-byte stsz can
    * DECLARE 2³¹ uniform-size samples; the table we materialize from
    * it must not be attacker-sized. 1M samples ≈ 16 MB of ranges. */
  private val MaxSamples = 1 << 20

  /** stsz body → per-sample sizes. Uniform layout (`sample_size > 0`)
    * expands to a constant array; table layout requires the declared
    * count's 4-byte entries to actually fit in the box body. */
  private def parseStsz(bytes: Array[Byte], from: Int, until: Int): Option[Array[Long]] = {
    if (until - from < 12) return None
    val uniform = u32be(bytes, from + 4)
    val count = u32be(bytes, from + 8)
    if (count < 0 || count > MaxSamples) None
    else if (uniform > 0) Some(Array.fill(count.toInt)(uniform))
    else if (from + 12 + 4L * count <= until)
      Some(Array.tabulate(count.toInt)(i => u32be(bytes, from + 12 + 4 * i)))
    else None
  }

  /** stsc body → (first_chunk, samples_per_chunk) runs; entries must
    * fit the body, start at chunk 1, and be strictly increasing in
    * first_chunk (ISO 14496-12 §8.7.4). */
  private def parseStsc(bytes: Array[Byte], from: Int, until: Int): Option[Array[(Long, Long)]] = {
    if (until - from < 8) return None
    val n = u32be(bytes, from + 4)
    if (n <= 0 || n > MaxSamples || from + 8 + 12L * n > until) return None
    val runs = Array.tabulate(n.toInt) { i =>
      (u32be(bytes, from + 8 + 12 * i), u32be(bytes, from + 8 + 12 * i + 4))
    }
    if (runs.head._1 != 1L) None
    else if ((1 until runs.length).exists(i => runs(i)._1 <= runs(i - 1)._1)) None
    else Some(runs)
  }

  /** stco (32-bit) or co64 (64-bit) body → file-absolute chunk
    * offsets. */
  private def parseChunkOffsets(bytes: Array[Byte], from: Int, until: Int,
      wide: Boolean): Option[Array[Long]] = {
    if (until - from < 8) return None
    val n = u32be(bytes, from + 4)
    val entry = if (wide) 8L else 4L
    if (n < 0 || n > MaxSamples || from + 8 + entry * n > until) None
    else Some(Array.tabulate(n.toInt) { i =>
      if (wide) u64be(bytes, from + 8 + 8 * i) else u32be(bytes, from + 8 + 4 * i)
    })
  }

  /** Assign consecutive samples to chunks per the stsc runs and lay
    * each chunk's samples end-to-end from its stco offset — the
    * standard ISO-BMFF sample-location algorithm. Every resulting
    * (offset, size) must fall inside the actual payload (chunk
    * offsets and sizes are attacker-controlled); chunks running out
    * before all samples are placed is malformed. */
  private def expandSamples(sizes: Array[Long], runs: Array[(Long, Long)],
      chunks: Array[Long], fileLen: Long): Option[Array[SampleRange]] = {
    if (sizes.isEmpty || chunks.isEmpty) return None
    val out = new Array[SampleRange](sizes.length)
    var s = 0; var r = 0; var c = 0
    while (s < sizes.length && c < chunks.length) {
      while (r + 1 < runs.length && runs(r + 1)._1 <= c + 1) r += 1
      val spc = runs(r)._2
      if (spc <= 0) return None
      var off = chunks(c)
      var k = 0L
      while (k < spc && s < sizes.length) {
        val sz = sizes(s)
        // overflow-safe: a hostile co64 offset near Long.MaxValue plus
        // a positive size wraps `off + sz` negative, which would slip
        // past a naive `off + sz > fileLen` and emit an out-of-payload
        // range — compare in subtracted form instead (sz <= fileLen
        // is guaranteed by the preceding bounds, so fileLen - sz
        // cannot underflow)
        if (sz < 0 || off < 0 || sz > fileLen || off > fileLen - sz) return None
        out(s) = SampleRange(off, sz)
        off += sz; k += 1; s += 1
      }
      c += 1
    }
    if (s == sizes.length) Some(out) else None
  }

  /** TRUE per-sample byte ranges for the VIDEO track: the full
    * `stsz` (sizes) + `stsc` (samples-per-chunk runs) + `stco`/`co64`
    * (chunk offsets) walk, composed into one file-absolute
    * `(offset, length)` per sample. Track selection mirrors
    * [[tryDecodeMp4]]: the first `trak` whose `mdia/hdlr` is `vide`,
    * falling back to the first trak with a complete sample table.
    * Returns None when any table is missing, malformed, or places a
    * sample outside the payload — callers stub, never throw. */
  def mp4SampleRanges(bytes: Array[Byte]): Option[Array[SampleRange]] =
    try {
      findBox(bytes, 0, bytes.length, List("moov")).flatMap {
        case (moovFrom, moovUntil) =>
          val traks = findBoxes(bytes, moovFrom, moovUntil, "trak")
          def handler(trak: (Int, Int)): Option[String] =
            findBox(bytes, trak._1, trak._2, List("mdia", "hdlr"))
              .collect { case (f, u) if u - f >= 12 => tag(bytes, f + 8) }
          def tableOf(trak: (Int, Int)): Option[Array[SampleRange]] =
            findBox(bytes, trak._1, trak._2, List("mdia", "minf", "stbl"))
              .flatMap { case (sf, su) =>
                for {
                  (zf, zu) <- findBox(bytes, sf, su, List("stsz"))
                  sizes <- parseStsz(bytes, zf, zu)
                  (cf, cu) <- findBox(bytes, sf, su, List("stsc"))
                  runs <- parseStsc(bytes, cf, cu)
                  offsets <- findBox(bytes, sf, su, List("stco"))
                    .flatMap { case (of, ou) => parseChunkOffsets(bytes, of, ou, wide = false) }
                    .orElse(findBox(bytes, sf, su, List("co64"))
                      .flatMap { case (of, ou) => parseChunkOffsets(bytes, of, ou, wide = true) })
                  table <- expandSamples(sizes, runs, offsets, bytes.length.toLong)
                } yield table
              }
          traks.find(handler(_).contains("vide")).flatMap(tableOf)
            .orElse(traks.iterator.flatMap(tableOf(_)).nextOption())
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** MP4 (ISO base media) probe: walks top-level boxes for
    * `moov/mvhd`, reading movie timescale + duration (version-0 32-bit
    * and version-1 64-bit layouts), then the VIDEO track's
    * `mdia/minf/stbl/stsz` sample count: every `trak` sibling is
    * examined and the first whose `mdia/hdlr` handler is `vide` wins —
    * a leading audio/chapter track must not donate its sample count.
    * Falls back to the first trak carrying an stsz when no handler
    * says `vide` (the fixture/minimal-file case); 0 when none does.
    * Requires a positive timescale and a duration that cannot
    * overflow the millisecond conversion; returns None otherwise. */
  def tryDecodeMp4(bytes: Array[Byte]): Option[Mp4Meta] =
    try {
      findBox(bytes, 0, bytes.length, List("moov")).flatMap {
        case (moovFrom, moovUntil) =>
          findBox(bytes, moovFrom, moovUntil, List("mvhd")).flatMap {
            case (from, until) =>
              if (until - from < 20) None
              else {
                val version = bytes(from) & 0xff
                val (timescale, duration) =
                  if (version == 1 && until - from >= 32)
                    (u32be(bytes, from + 20), u64be(bytes, from + 24))
                  else if (version == 0)
                    (u32be(bytes, from + 12), u32be(bytes, from + 16))
                  else (0L, 0L)
                if (timescale <= 0 || duration < 0 ||
                    duration > Long.MaxValue / 1000L) None
                else {
                  val traks = findBoxes(bytes, moovFrom, moovUntil, "trak")
                  def handler(trak: (Int, Int)): Option[String] =
                    findBox(bytes, trak._1, trak._2, List("mdia", "hdlr"))
                      .collect { case (f, u) if u - f >= 12 => tag(bytes, f + 8) }
                  def stszCount(trak: (Int, Int)): Option[Int] =
                    findBox(bytes, trak._1, trak._2,
                        List("mdia", "minf", "stbl", "stsz"))
                      .collect { case (f, u) if u - f >= 12 => u32be(bytes, f + 8) }
                      .filter(n => n >= 0 && n <= Int.MaxValue)
                      .map(_.toInt)
                  val frames = traks.find(handler(_).contains("vide"))
                    .flatMap(stszCount)
                    .orElse(traks.flatMap(stszCount(_)).headOption)
                    .getOrElse(0)
                  Some(Mp4Meta(timescale, duration * 1000L / timescale, frames))
                }
              }
          }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  // ----------------------------------------------------------------
  // Deterministic fixture builders — the spec and the q108 oracle gate
  // construct REAL container bytes from integer parameters, so the
  // parse above is verified against ground truth an SQL engine can
  // recompute (parse(build(p)) must reproduce p's derived fields).

  /** Minimal valid PCM WAV: 44-byte canonical header + `frames` sample
    * frames of deterministic bytes (`(i % 251)`). */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      frames: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && frames >= 0)
    require(bitsPerSample % 8 == 0 && bitsPerSample > 0)
    val align = channels * bitsPerSample / 8
    val dataLen = frames * align
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(36 + dataLen); out.put("WAVE".getBytes)
    out.put("fmt ".getBytes); out.putInt(16)
    out.putShort(1) // PCM
    out.putShort(channels.toShort); out.putInt(sampleRate)
    out.putInt(sampleRate * align) // byte rate
    out.putShort(align.toShort); out.putShort(bitsPerSample.toShort)
    out.put("data".getBytes); out.putInt(dataLen)
    var i = 0; while (i < dataLen) { out.put((i % 251).toByte); i += 1 }
    out.array()
  }

  /** Minimal valid MPEG1/2 Layer III stream: an optional ID3v2 tag
    * (synchsafe size, zero-filled body) followed by `frames` CBR
    * frames — each a real 4-byte header (version/bitrate-index/
    * rate-index/mono flags) plus deterministic filler to the computed
    * frame length. `bitrateIdx` ∈ [1,14] and `rateIdx` ∈ [0,2] index
    * the public tables; frame length arithmetic matches the parser
    * (`spf/8 · kbps·1000 / rate`, no padding bit). */
  def mp3Bytes(mpeg1: Boolean, bitrateIdx: Int, rateIdx: Int, frames: Int,
      mono: Boolean = false, id3Size: Int = 0): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && rateIdx >= 0 && rateIdx <= 2)
    require(frames >= 1 && id3Size >= 0 && id3Size < (1 << 21))
    val kbps = if (mpeg1) Mp3BitrateV1(bitrateIdx) else Mp3BitrateV2(bitrateIdx)
    val rate = if (mpeg1) Mp3RateV1(rateIdx) else Mp3RateV2(rateIdx)
    val spf = if (mpeg1) 1152 else 576
    val frameLen = spf / 8 * (kbps * 1000) / rate
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // version 2.4, no flags
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      (0 until id3Size).foreach(_ => out.write(0))
    }
    val b1 = 0xe0 | ((if (mpeg1) 3 else 2) << 3) | (1 << 1) | 1 // ver, LIII, no CRC
    val b2 = (bitrateIdx << 4) | (rateIdx << 2) // no padding
    val b3 = if (mono) 0xc0 else 0x00
    (0 until frames).foreach { f =>
      out.write(0xff); out.write(b1); out.write(b2); out.write(b3)
      (4 until frameLen).foreach(j => out.write((f * 7 + j) % 251))
    }
    out.toByteArray
  }

  /** VBR MP3 fixture: optional ID3v2 tag, then a HEADER frame
    * carrying a Xing (`"xing"`), Info (`"info"`) or VBRI (`"vbri"`)
    * tag with DECLARED frame/byte totals at the spec offsets
    * ([[mp3VbrHeader]] doc), then `audioFrames` real Layer III
    * frames ALTERNATING `bitrateIdxA`/`bitrateIdxB` — true VBR,
    * each frame's length follows its own header. `kind = "none"`
    * writes the same layout with no tag (a silent lead frame), for
    * exercising the walk on alternating-bitrate streams. */
  def mp3BytesVbr(mpeg1: Boolean, rateIdx: Int, audioFrames: Int,
      declaredFrames: Int, declaredBytes: Long, kind: String,
      bitrateIdxA: Int = 9, bitrateIdxB: Int = 11,
      headerBitrateIdx: Int = 9, mono: Boolean = false,
      id3Size: Int = 0): Array[Byte] = {
    require(Set("xing", "info", "vbri", "none").contains(kind), s"kind=$kind")
    require(rateIdx >= 0 && rateIdx <= 2 && audioFrames >= 0)
    require(declaredFrames >= 1 && declaredBytes >= 1)
    require(id3Size >= 0 && id3Size < (1 << 21))
    val rate = if (mpeg1) Mp3RateV1(rateIdx) else Mp3RateV2(rateIdx)
    val spf = if (mpeg1) 1152 else 576
    def kbpsOf(idx: Int) = if (mpeg1) Mp3BitrateV1(idx) else Mp3BitrateV2(idx)
    def frameLenOf(idx: Int) = spf / 8 * (kbpsOf(idx) * 1000) / rate
    def put32(arr: Array[Byte], i: Int, v: Long): Unit = {
      arr(i) = ((v >> 24) & 0xff).toByte; arr(i + 1) = ((v >> 16) & 0xff).toByte
      arr(i + 2) = ((v >> 8) & 0xff).toByte; arr(i + 3) = (v & 0xff).toByte
    }
    def headerBytes(idx: Int): Array[Byte] = Array(
      0xff.toByte,
      (0xe0 | ((if (mpeg1) 3 else 2) << 3) | (1 << 1) | 1).toByte,
      ((idx << 4) | (rateIdx << 2)).toByte,
      (if (mono) 0xc0 else 0x00).toByte)
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0)
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      (0 until id3Size).foreach(_ => out.write(0))
    }
    val hLen = frameLenOf(headerBitrateIdx)
    val frame = new Array[Byte](hLen) // zero side info + payload
    System.arraycopy(headerBytes(headerBitrateIdx), 0, frame, 0, 4)
    kind match {
      case "vbri" =>
        require(hLen >= 54, s"header frame too small for VBRI: $hLen")
        System.arraycopy("VBRI".getBytes("US-ASCII"), 0, frame, 36, 4)
        // version(2) + delay(2) + quality(2) stay zero
        put32(frame, 46, declaredBytes)
        put32(frame, 50, declaredFrames.toLong)
      case "xing" | "info" =>
        val side = if (mpeg1) { if (mono) 17 else 32 }
          else { if (mono) 9 else 17 }
        val xi = 4 + side
        require(xi + 16 <= hLen, s"header frame too small for Xing: $hLen")
        System.arraycopy(
          (if (kind == "xing") "Xing" else "Info").getBytes("US-ASCII"),
          0, frame, xi, 4)
        put32(frame, xi + 4, 3L) // flags: frames | bytes
        put32(frame, xi + 8, declaredFrames.toLong)
        put32(frame, xi + 12, declaredBytes)
      case _ => () // "none": a silent lead frame, no tag
    }
    out.write(frame)
    (0 until audioFrames).foreach { f =>
      val idx = if (f % 2 == 0) bitrateIdxA else bitrateIdxB
      val fl = frameLenOf(idx)
      out.write(headerBytes(idx))
      (4 until fl).foreach(j => out.write((f * 7 + j) % 251))
    }
    out.toByteArray
  }

  /** Minimal valid FLAC: `fLaC` magic + mandatory STREAMINFO (exact
    * 34-byte layout with the 20/3/5/36-bit packed fields) + an
    * optional PADDING block (exercising the last-flag walk) +
    * `dataLen` deterministic filler standing in for the frames. */
  def flacBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, dataLen: Int = 0, withPadding: Boolean = false): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20))
    require(channels >= 1 && channels <= 8)
    require(bitsPerSample >= 4 && bitsPerSample <= 32)
    require(totalSamples >= 0 && totalSamples < (1L << 36) && dataLen >= 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO header: type 0, last unless a padding block follows
    out.write(if (withPadding) 0x00 else 0x80)
    out.write(0); out.write(0); out.write(34)
    val si = java.nio.ByteBuffer.allocate(34)
    si.putShort(4096.toShort); si.putShort(4096.toShort) // min/max block
    si.put(Array[Byte](0, 0, 0)); si.put(Array[Byte](0, 0, 0)) // min/max frame
    // 64-bit packed: rate(20) | channels-1(3) | bps-1(5) | samples(36)
    val packed = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bitsPerSample - 1).toLong << 36) | totalSamples
    si.putLong(packed)
    si.put(Array.fill(16)(0: Byte)) // md5 of the unencoded audio
    out.write(si.array())
    if (withPadding) {
      out.write(0x81); out.write(0); out.write(0); out.write(6) // last PADDING
      (0 until 6).foreach(_ => out.write(0))
    }
    (0 until dataLen).foreach(j => out.write(j % 251))
    out.toByteArray
  }

  /** ISO-BMFF box with header, for fixture assembly. */
  private def isoBox(boxType: String, body: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
    out.putInt(8 + body.length); out.put(boxType.getBytes); out.put(body)
    out.array()
  }

  /** A fixture track: `trak{mdia{hdlr(handlerType), minf/stbl/stsz}}`
    * with a `free` sibling ahead of stbl (the walk must skip
    * non-matching boxes). 33-byte hdlr + 89-byte mdia shell. */
  private def trakBytes(handlerType: String, frames: Int): Array[Byte] = {
    val hdlrBody = java.nio.ByteBuffer.allocate(25)
      .putInt(0).putInt(0).put(handlerType.getBytes).array() // +12 reserved +1 name
    val stszBody = java.nio.ByteBuffer.allocate(12)
      .putInt(0).putInt(0).putInt(frames).array() // uniform size 0, count
    val stbl = isoBox("stbl", isoBox("stsz", stszBody))
    isoBox("trak", isoBox("mdia", isoBox("hdlr", hdlrBody) ++ isoBox("minf",
      isoBox("free", Array.fill(4)(0: Byte)) ++ stbl)))
  }

  /** Minimal valid MP4: `ftyp` + `moov{mvhd, trak('vide'){mdia{hdlr,
    * minf/stbl/stsz}}}` + a short `mdat`. `mvhdVersion` selects the
    * 32-bit (0) or 64-bit (1) mvhd layout — both appear in the wild
    * and both must parse. `audioFramesFirst` prepends a full `soun`
    * track BEFORE the video track — the common real-file layout the
    * frame-count walk must not be fooled by. */
  private def mvhdBody(timescale: Int, duration: Long, mvhdVersion: Int): Array[Byte] = {
    val fixed = 80 // rate+volume+reserved+matrix+predefined+next_track
    val out = java.nio.ByteBuffer.allocate(
      if (mvhdVersion == 0) 20 + fixed else 32 + fixed)
    out.putInt(mvhdVersion << 24) // version byte + zero flags
    if (mvhdVersion == 0) {
      out.putInt(0); out.putInt(0) // creation/modification
      out.putInt(timescale); out.putInt(duration.toInt)
    } else {
      out.putLong(0L); out.putLong(0L)
      out.putInt(timescale); out.putLong(duration)
    }
    out.putInt(0x00010000); out.putShort(0x0100.toShort) // rate 1.0, volume 1.0
    out.array()
  }

  def mp4Bytes(timescale: Int, duration: Long, frames: Int,
      mvhdVersion: Int = 0, audioFramesFirst: Option[Int] = None): Array[Byte] = {
    require(timescale > 0 && duration >= 0 && frames >= 0)
    require(mvhdVersion == 0 || mvhdVersion == 1)
    val traks = audioFramesFirst.map(trakBytes("soun", _))
      .getOrElse(Array.emptyByteArray) ++ trakBytes("vide", frames)
    val ftyp = isoBox("ftyp",
      "isom".getBytes ++ Array.fill(4)(0: Byte) ++ "isom".getBytes)
    val moov = isoBox("moov",
      isoBox("mvhd", mvhdBody(timescale, duration, mvhdVersion)) ++ traks)
    val mdat = isoBox("mdat", Array.tabulate(8)(i => (i * 7).toByte))
    ftyp ++ moov ++ mdat
  }

  /** Fixture MP4 with a FULL sample table — per-sample sizes (stsz
    * table layout), samples-per-chunk runs (stsc; a trailing partial
    * chunk gets its own run, so multi-entry expansion is exercised),
    * and real chunk offsets (stco, or co64 when `useCo64`). The file
    * is laid out `ftyp ++ mdat ++ moov` — mdat BEFORE moov, the
    * common streaming-unfriendly layout — so every chunk offset is
    * `28 + Σ preceding sizes + chunkGap·chunkIdx`, independent of the
    * moov size and recomputable by a SQL oracle. Sample `i`'s bytes
    * are the closed-form ramp `byte_j = 32 + (seed + 7i + 11j) mod 95`
    * (printable ASCII, so a SQL oracle can rebuild the exact bytes
    * and their md5). `chunkGap` pad bytes separate chunks, making
    * chunk offsets ≠ a global prefix sum — a parser that ignores
    * stco cannot round-trip this fixture. */
  def mp4BytesChunked(timescale: Int, duration: Long, sampleSizes: Seq[Int],
      seed: Long, samplesPerChunk: Int = 5, chunkGap: Int = 3,
      mvhdVersion: Int = 0, audioFramesFirst: Option[Int] = None,
      useCo64: Boolean = false, uniformStsz: Boolean = false): Array[Byte] = {
    require(timescale > 0 && duration >= 0 && sampleSizes.nonEmpty)
    require(sampleSizes.forall(_ >= 0) && samplesPerChunk >= 1 && chunkGap >= 0)
    require(mvhdVersion == 0 || mvhdVersion == 1)
    require(!uniformStsz || sampleSizes.distinct.length == 1,
      "uniform stsz layout requires all sample sizes equal")
    val fr = sampleSizes.length
    val chunkSizes = sampleSizes.grouped(samplesPerChunk).toArray
    val ftyp = isoBox("ftyp",
      "isom".getBytes ++ Array.fill(4)(0: Byte) ++ "isom".getBytes)
    val bodyStart = ftyp.length + 8 // == 28: mdat body right after ftyp
    val body = new java.io.ByteArrayOutputStream()
    val chunkOffsets = Array.newBuilder[Long]
    var sampleIdx = 0
    chunkSizes.zipWithIndex.foreach { case (chunk, ci) =>
      if (ci > 0) (0 until chunkGap).foreach(_ => body.write(0xAA))
      chunkOffsets += (bodyStart + body.size()).toLong
      chunk.foreach { sz =>
        var j = 0
        while (j < sz) {
          body.write(32 + ((seed + 7L * sampleIdx + 11L * j) % 95).toInt)
          j += 1
        }
        sampleIdx += 1
      }
    }
    val offsets = chunkOffsets.result()
    val stszBody =
      if (uniformStsz) // constant-size layout: no table, just the size
        java.nio.ByteBuffer.allocate(12)
          .putInt(0).putInt(sampleSizes.head).putInt(fr).array()
      else {
        val out = java.nio.ByteBuffer.allocate(12 + 4 * fr)
        out.putInt(0).putInt(0).putInt(fr) // flags, size 0 → table follows
        sampleSizes.foreach(out.putInt)
        out.array()
      }
    val stscRuns: Seq[(Int, Int)] = {
      val rem = fr % samplesPerChunk
      if (chunkSizes.length > 1 && rem != 0)
        Seq((1, samplesPerChunk), (chunkSizes.length, rem))
      else Seq((1, math.min(fr, samplesPerChunk)))
    }
    val stscBody = {
      val out = java.nio.ByteBuffer.allocate(8 + 12 * stscRuns.length)
      out.putInt(0).putInt(stscRuns.length)
      stscRuns.foreach { case (first, spc) =>
        out.putInt(first).putInt(spc).putInt(1) }
      out.array()
    }
    val coBody = {
      val w = if (useCo64) 8 else 4
      val out = java.nio.ByteBuffer.allocate(8 + w * offsets.length)
      out.putInt(0).putInt(offsets.length)
      offsets.foreach(o => if (useCo64) out.putLong(o) else out.putInt(o.toInt))
      out.array()
    }
    val stbl = isoBox("stbl",
      isoBox("stsz", stszBody) ++ isoBox("stsc", stscBody) ++
        isoBox(if (useCo64) "co64" else "stco", coBody))
    val hdlrBody = java.nio.ByteBuffer.allocate(25)
      .putInt(0).putInt(0).put("vide".getBytes).array()
    val videTrak = isoBox("trak", isoBox("mdia",
      isoBox("hdlr", hdlrBody) ++ isoBox("minf",
        isoBox("free", Array.fill(4)(0: Byte)) ++ stbl)))
    val traks = audioFramesFirst.map(trakBytes("soun", _))
      .getOrElse(Array.emptyByteArray) ++ videTrak
    val moov = isoBox("moov",
      isoBox("mvhd", mvhdBody(timescale, duration, mvhdVersion)) ++ traks)
    ftyp ++ isoBox("mdat", body.toByteArray) ++ moov
  }

  /** One probed row per media payload: the union of every container's
    * metadata, null-free (fields a codec doesn't have are 0), plus
    * `codec` naming which parser claimed the payload — `image`, `wav`,
    * `mp4`, or `stub` for the deterministic fallback. */
  final case class MediaProbe(
      media_id: Long, kind: String, n_bytes: Long, codec: String,
      width: Int, height: Int, sample_rate: Int, channels: Int,
      duration_ms: Long, frames: Int)

  /** Full-featured media probe — supersedes [[decodeStub]] (kept for
    * its dimensions-only schema): tries the REAL header parse for each
    * payload — ImageIO for `image`, [[tryDecodeWav]] for `audio`,
    * [[tryDecodeMp4]] for `video` — and only a payload no parser
    * accepts takes the stub path with length-derived fake metadata.
    * Same execution shape as [[decodeStub]]: one `mapPartitions` pass,
    * payloads stay executor-side, metadata lands columnar. */
  def probeMedia(spark: SparkSession, media: DataFrame): Dataset[MediaProbe] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { m =>
        val n = m.payload.length.toLong
        val probed: Option[MediaProbe] = m.kind match {
          case "image" => tryDecodeImage(m.payload).map { case (w, h) =>
            MediaProbe(m.media_id, m.kind, n, "image", w, h, 0, 0, 0L, 1) }
          case "audio" => tryDecodeWav(m.payload).map { w =>
            MediaProbe(m.media_id, m.kind, n, "wav", 0, 0,
              w.sampleRate, w.channels, w.durationMs, 0) }
            .orElse(tryDecodeFlac(m.payload).map { f =>
              MediaProbe(m.media_id, m.kind, n, "flac", 0, 0,
                f.sampleRate, f.channels, f.durationMs, 0) })
            .orElse(tryDecodeMp3(m.payload).map { p =>
              MediaProbe(m.media_id, m.kind, n, "mp3", 0, 0,
                p.sampleRate, p.channels, p.durationMs, p.frames) })
          case "video" => tryDecodeMp4(m.payload).map { v =>
            MediaProbe(m.media_id, m.kind, n, "mp4", 0, 0, 0, 0,
              v.durationMs, v.frames) }
          case _ => None
        }
        probed.getOrElse( // stub fallback: deterministic in n (cf. decodeStub)
          MediaProbe(m.media_id, m.kind, n, "stub",
            width = (n % 640).toInt, height = (n % 480).toInt,
            sample_rate = (n % 48000).toInt, channels = (n % 8).toInt,
            duration_ms = n,
            frames = if (m.kind == "video") (n % 30 + 1).toInt else 1))
      }
    }
  }

  /** Pixel budget for a FULL image decode ([[imageStats]]): the header
    * probe's dimension cap bounds each side, this bounds the buffer a
    * real decode may allocate (4M px ≈ 16 MB ARGB) — a payload
    * declaring more takes the stub path. */
  private val MaxDecodePixels = 1 << 22

  /** Deterministic PNG fixture: a `w`×`h` RGB image whose channels
    * follow closed-form ramps an SQL oracle can recompute —
    * `R(x,y) = (7x + 13y + seed) % 256`, `G = (3x + 5y + 2·seed) % 256`,
    * `B = (11x + 2y + 3·seed) % 256` — encoded through the JDK's real
    * PNG writer (lossless RGB, so decode returns the exact pattern). */
  def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w >= 1 && h >= 1 && w * h <= MaxDecodePixels)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((7 * x + 13 * y + seed) % 256).toInt
        val g = ((3 * x + 5 * y + 2 * seed) % 256).toInt
        val b = ((11 * x + 2 * y + 3 * seed) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Per-channel image statistics row: exact integer channel sums
    * divided once at the end, so the doubles are bit-reproducible. */
  final case class ImageStats(
      media_id: Long, kind: String, n_bytes: Long, codec: String,
      width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL pixel-statistics decode for `kind = "image"` payloads: the
    * header-only probe runs FIRST (dimension cap + [[MaxDecodePixels]]
    * budget — an untrusted header can't make the full decode allocate
    * an unbounded buffer), then `ImageIO.read` decodes the pixels and
    * the per-channel means come from exact integer sums. Payloads that
    * fail the probe, the budget, or the decode take the stub path
    * (means deterministic in payload length, like [[probeMedia]]).
    * Same scale shape as every kernel here: one `mapPartitions` pass,
    * payload bytes never leave the executor, output is columnar. */
  def imageStats(spark: SparkSession, media: DataFrame): Dataset[ImageStats] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { m =>
        val n = m.payload.length.toLong
        val real: Option[ImageStats] =
          if (m.kind != "image") None
          else tryDecodeImage(m.payload)
            .filter { case (w, h) => w.toLong * h <= MaxDecodePixels }
            .flatMap { case (w, h) =>
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(m.payload))
                if (img == null || img.getWidth != w || img.getHeight != h) None
                else {
                  var (sr, sg, sb) = (0L, 0L, 0L)
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val p = img.getRGB(x, y)
                      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                      x += 1
                    }
                    y += 1
                  }
                  val px = w.toLong * h
                  Some(ImageStats(m.media_id, m.kind, n, "image", w, h,
                    sr.toDouble / px, sg.toDouble / px, sb.toDouble / px))
                }
              } catch { case scala.util.control.NonFatal(_) => None }
            }
        real.getOrElse(ImageStats(m.media_id, m.kind, n, "stub",
          width = (n % 640).toInt, height = (n % 480).toInt,
          mean_r = (n % 251).toDouble, mean_g = (n % 241).toDouble,
          mean_b = (n % 239).toDouble))
      }
    }
  }

  /** One resized image row: exact-arithmetic columns (the gated
    * surface) plus the re-encoded PNG bytes — REAL plumbing whose
    * byte content is writer-specific and therefore not oracle-checked
    * (lossless RGB, so a decode of `resized_png` returns exactly the
    * sampled pixels). */
  final case class ResizedImage(
    media_id: Long, codec: String, src_w: Int, src_h: Int,
    out_w: Int, out_h: Int,
    mean_r: Double, mean_g: Double, mean_b: Double,
    resized_png: Array[Byte])

  /** NEAREST-NEIGHBOR image resize to a fixed `outW`×`outH` — the
    * normalize-for-the-vision-encoder pass every multimodal pipeline
    * runs before batching. The sample map is EXACT integer
    * arithmetic — source pixel `(sx, sy) = ((x'·w) DIV outW,
    * (y'·h) DIV outH)` — so an SQL oracle replays the whole resample
    * on the fixture's closed-form ramps; per-channel means of the
    * RESIZED grid come from exact integer sums (one division at the
    * end). The decode side is [[imageStats]]'s discipline (header
    * probe → pixel budget → real `ImageIO` decode; failures take the
    * deterministic stub), and the resized image is RE-ENCODED through
    * the JDK's real PNG writer and carried as a binary column —
    * schema, batch shape, and executor-side byte handling are the
    * production plumbing; only the encoder's exact byte stream is
    * writer-specific and left ungated. One `mapPartitions` pass,
    * payload bytes never leave the executor. */
  def imageResize(spark: SparkSession, media: DataFrame,
      outW: Int, outH: Int): Dataset[ResizedImage] = {
    require(outW >= 1 && outH >= 1 && outW.toLong * outH <= MaxDecodePixels,
      s"bad target size ${outW}x$outH")
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { m =>
        val n = m.payload.length.toLong
        val real: Option[ResizedImage] =
          if (m.kind != "image") None
          else tryDecodeImage(m.payload)
            .filter { case (w, h) => w.toLong * h <= MaxDecodePixels }
            .flatMap { case (w, h) =>
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(m.payload))
                if (img == null || img.getWidth != w || img.getHeight != h) None
                else {
                  val out = new java.awt.image.BufferedImage(
                    outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
                  var (sr, sg, sb) = (0L, 0L, 0L)
                  var y = 0
                  while (y < outH) {
                    val sy = (y.toLong * h / outH).toInt
                    var x = 0
                    while (x < outW) {
                      val sx = (x.toLong * w / outW).toInt
                      val p = img.getRGB(sx, sy) & 0xffffff
                      out.setRGB(x, y, p)
                      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                      x += 1
                    }
                    y += 1
                  }
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(out, "png", bos)
                  val px = outW.toLong * outH
                  Some(ResizedImage(m.media_id, "image", w, h, outW, outH,
                    sr.toDouble / px, sg.toDouble / px, sb.toDouble / px,
                    bos.toByteArray))
                }
              } catch { case scala.util.control.NonFatal(_) => None }
            }
        real.getOrElse(ResizedImage(m.media_id, "stub",
          src_w = (n % 640).toInt, src_h = (n % 480).toInt,
          out_w = outW, out_h = outH,
          mean_r = (n % 251).toDouble, mean_g = (n % 241).toDouble,
          mean_b = (n % 239).toDouble, resized_png = Array.emptyByteArray))
      }
    }
  }

  /** Deterministic HIGH-ENTROPY PNG fixture — the [[pngBytes]] ramp's
    * noise twin for perceptual-hash gates: per pixel, channels come
    * from the md5 hex of `"$key:$x:$y"` (`r` = hex[0,2), `g` =
    * hex[2,4), `b` = hex[4,6), each parsed base-16 → 0–255), so an
    * SQL oracle replays every pixel and two images share content iff
    * they share `key` — near-dup classes are PLANTED, never
    * accidental (the ramp fixture's low-entropy gradients collide
    * across seeds, which makes its near-dup relation quadratically
    * dense — wrong regime for LSH gates). `tintTopRow` adds +40 (mod
    * 256) to row 0's red channel: a watermark-sized perturbation that
    * moves only the hash bits sampled from source row 0. Encoded
    * through the JDK's real PNG writer (lossless RGB). */
  def pngNoiseBytes(w: Int, h: Int, key: String,
      tintTopRow: Boolean = false): Array[Byte] = {
    require(w >= 1 && h >= 1 && w * h <= MaxDecodePixels)
    val md = java.security.MessageDigest.getInstance("MD5")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val hex = md.digest(s"$key:$x:$y".getBytes("UTF-8"))
          .take(3).map(b => f"${b & 0xff}%02x").mkString
        val r0 = Integer.parseInt(hex.substring(0, 2), 16)
        val r = if (tintTopRow && y == 0) (r0 + 40) % 256 else r0
        val g = Integer.parseInt(hex.substring(2, 4), 16)
        val b = Integer.parseInt(hex.substring(4, 6), 16)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** One perceptual-hash row: the 64-bit DIFFERENCE HASH (dHash) of
    * the decoded image carried as four 16-bit bands — the Hamming-LSH
    * bucket keys directly, and integer-exact in any engine (a packed
    * signed 64-bit long would need sign gymnastics in SQL). */
  final case class ImageDHash(
      media_id: Long, codec: String, b0: Int, b1: Int, b2: Int, b3: Int)

  /** PERCEPTUAL image hash — the dedup suite's image modality
    * (average/difference-hash family; dHash per Krawetz's published
    * description): decode ([[imageStats]]'s probe → pixel-budget →
    * real `ImageIO` discipline), integer luma
    * `gray = (299·r + 587·g + 114·b) DIV 1000`, nearest-neighbor
    * sample to a 9×8 grid with [[imageResize]]'s EXACT map
    * `(sx, sy) = ((x·w) DIV 9, (y·h) DIV 8)`, then 64 horizontal
    * gradient bits `bit(x,y) = gray(x,y) < gray(x+1,y)` packed
    * little-endian into four 16-bit bands (`b_j` holds bits
    * `[16j, 16j+16)`, bit index `i = y·8 + x`). Every step is integer
    * arithmetic on deterministically decoded pixels, so an SQL oracle
    * replays the hash from the fixture's closed-form ramps — and two
    * renditions of the same content (rescaled, re-encoded) land
    * within a few bits of each other, which is the property
    * [[Dedup.hammingNearDupPairs]] bands on. Non-decodable payloads
    * take the deterministic stub (`b_j = (n·(j+1)) mod 65536`,
    * codec = "stub"). One `mapPartitions` pass; payload bytes never
    * leave the executor. */
  def imageDHash(spark: SparkSession, media: DataFrame): Dataset[ImageDHash] = {
    import spark.implicits._
    // adaptive parallelism floor (guide §2.5, r19): the PNG decode is
    // the whole cost and inherits the upstream task count — one task
    // on the single-row-group gate corpora; no-op on parallel inputs
    Parallelism.spread(media, "media_id").as[MediaRecord].mapPartitions { batch =>
      batch.map { m =>
        val n = m.payload.length.toLong
        val real: Option[ImageDHash] =
          if (m.kind != "image") None
          else tryDecodeImage(m.payload)
            .filter { case (w, h) => w.toLong * h <= MaxDecodePixels }
            .flatMap { case (w, h) =>
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(m.payload))
                if (img == null || img.getWidth != w || img.getHeight != h) None
                else {
                  val gray = Array.ofDim[Int](8, 9)
                  var y = 0
                  while (y < 8) {
                    val sy = (y.toLong * h / 8).toInt
                    var x = 0
                    while (x < 9) {
                      val sx = (x.toLong * w / 9).toInt
                      val p = img.getRGB(sx, sy)
                      gray(y)(x) = (299 * ((p >> 16) & 0xff) +
                        587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
                      x += 1
                    }
                    y += 1
                  }
                  val bands = Array.fill(4)(0)
                  var i = 0
                  while (i < 64) {
                    val (yy, xx) = (i / 8, i % 8)
                    if (gray(yy)(xx) < gray(yy)(xx + 1))
                      bands(i / 16) |= 1 << (i % 16)
                    i += 1
                  }
                  Some(ImageDHash(m.media_id, "image",
                    bands(0), bands(1), bands(2), bands(3)))
                }
              } catch { case scala.util.control.NonFatal(_) => None }
            }
        real.getOrElse(ImageDHash(m.media_id, "stub",
          (n % 65536L).toInt, (n * 2 % 65536L).toInt,
          (n * 3 % 65536L).toInt, (n * 4 % 65536L).toInt))
      }
    }
  }

  /** Strided frame sampling over video payloads: pick (up to) `k`
    * frame indices evenly across each video — `idx_j = ⌊j·frames/k⌋`,
    * de-duplicated for short videos — and emit each sampled frame as a
    * zero-copy binary slice with its (offset, length) provenance and a
    * content md5.
    *
    * The CODEC boundary is the honest stub (`???`-equivalent, as in
    * [[decodeStub]]): a real container parser would read the frame
    * count and per-frame byte ranges from the header; here the stub
    * models fixed-size frames — `frames = n % 30 + 1`,
    * `frame_len = n / frames` (matching [[decodeStub]]'s video path) —
    * so the oracle can recompute every output column. Everything else
    * is the real scale design: the `kind` filter prunes on columnar
    * metadata BEFORE any payload is touched, the index set explodes
    * per row (`explode` over a ≤k-element array — no join, no
    * shuffle), and the slice is `substring` on the binary column
    * (codegen'd, executor-side; payload bytes never reach the driver).
    * At 100 TB this is the exact shape of "sample 4 frames from every
    * video for a vision encoder": one map-side pass, output ~k/frames
    * of the input bytes. */
  def frameSample(media: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val n = octet_length(col("payload")).cast("long")
    media.filter(col("kind") === "video")
      .withColumn("__frames", n % 30 + 1)
      .withColumn("__flen", (n / col("__frames")).cast("long"))
      .withColumn("frame_idx", explode(array_distinct(
        transform(sequence(lit(0L), lit((k - 1).toLong)),
          j => floor(j * col("__frames") / k)))))
      .withColumn("frame_offset", col("frame_idx") * col("__flen"))
      .withColumn("frame_len", col("__flen"))
      .withColumn("frame_md5",
        md5(expr("substring(payload, frame_offset + 1, frame_len)")))
      .select(col("media_id"), col("frame_idx"), col("frame_offset"),
        col("frame_len"), col("frame_md5"))
  }

  /** [[frameSample]] with the frame COUNT read from the REAL container
    * when the payload parses as MP4 ([[tryDecodeMp4]] — the video
    * track's stsz sample count); only unparseable payloads fall back
    * to the stub model. Frame byte-ranges here remain the uniform
    * `n / frames` model — [[frameSampleExact]] supersedes this with
    * TRUE per-sample ranges from the stsz SIZE table + stco/co64
    * chunk offsets. Same scale shape as [[frameSample]]: the parse is
    * one map-side pass (the payload is already executor-local), the
    * index set explodes per row, the slice is codegen'd substring. */
  def frameSampleProbed(spark: SparkSession, media: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    require(k >= 1, s"k must be positive, got $k")
    val withFrames = media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { m =>
        if (m.kind != "video") Iterator.empty
        else {
          val n = m.payload.length.toLong
          val frames = tryDecodeMp4(m.payload).map(_.frames.toLong)
            .filter(_ > 0).getOrElse(n % 30 + 1)
          Iterator.single((m.media_id, m.payload, frames))
        }
      }
    }.toDF("media_id", "payload", "__frames")
    withFrames
      .withColumn("__flen",
        (octet_length(col("payload")).cast("long") / col("__frames")).cast("long"))
      .withColumn("frame_idx", explode(array_distinct(
        transform(sequence(lit(0L), lit((k - 1).toLong)),
          j => floor(j * col("__frames") / k)))))
      .withColumn("frame_offset", col("frame_idx") * col("__flen"))
      .withColumn("frame_len", col("__flen"))
      .withColumn("frame_md5",
        md5(expr("substring(payload, frame_offset + 1, frame_len)")))
      .select(col("media_id"), col("frame_idx"), col("frame_offset"),
        col("frame_len"), col("frame_md5"))
  }

  /** One sampled frame's provenance: its stride index, TRUE byte
    * range, and which path produced it (`mp4` = real sample table,
    * `stub` = uniform model fallback). */
  final case class FrameSlice(
      frame_idx: Long, frame_offset: Long, frame_len: Long, codec: String)

  /** [[frameSampleProbed]] completed: both the frame COUNT and each
    * sampled frame's byte RANGE come from the REAL container tables
    * ([[mp4SampleRanges]] — stsz sizes + stsc runs + stco/co64 chunk
    * offsets), so `frame_offset`/`frame_len` are the sample's true
    * location and `frame_md5` hashes the actual frame bytes. Only a
    * payload whose sample tables are missing, malformed, or
    * out-of-bounds falls back to the uniform `n / frames` stub model
    * (`codec = "stub"`).
    *
    * Scale shape: the table parse and stride selection are one
    * map-side pass (payloads already executor-local, never driver-
    * side), the ≤k slices per video explode from an array column (no
    * join, no shuffle), and the byte slice + md5 stay codegen'd
    * (`substring`/`md5` builtins on the binary column). At 100 TB
    * this reads each video's header once and emits ~k frames of
    * bytes — the "sample 4 frames per video for a vision encoder"
    * shape with exact provenance. */
  def frameSampleExact(spark: SparkSession, media: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    require(k >= 1, s"k must be positive, got $k")
    def stride(frames: Long): Seq[Long] =
      (0L until k.toLong).map(j => j * frames / k).distinct
    val sliced = media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { m =>
        if (m.kind != "video") Iterator.empty
        else {
          val slices = mp4SampleRanges(m.payload).filter(_.nonEmpty) match {
            case Some(table) =>
              stride(table.length.toLong).map { i =>
                val r = table(i.toInt)
                FrameSlice(i, r.offset, r.size, "mp4")
              }
            case None =>
              val n = m.payload.length.toLong
              val frames = n % 30 + 1
              val flen = n / frames
              stride(frames).map(i => FrameSlice(i, i * flen, flen, "stub"))
          }
          Iterator.single((m.media_id, m.payload, slices))
        }
      }
    }.toDF("media_id", "payload", "slices")
    sliced
      .select(col("media_id"), col("payload"), explode(col("slices")).as("s"))
      .select(col("media_id"),
        col("s.frame_idx").as("frame_idx"),
        col("s.frame_offset").as("frame_offset"),
        col("s.frame_len").as("frame_len"),
        md5(expr("substring(payload, s.frame_offset + 1, s.frame_len)"))
          .as("frame_md5"),
        col("s.codec").as("codec"))
  }

  /** Feature extraction over a media table. Images decode for real
    * (see [[tryDecodeImage]]); audio/video — and undecodable image
    * bytes — take the stub path: dimensions are a deterministic
    * function of payload length. */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { m =>
        val n = m.payload.length.toLong
        val real = if (m.kind == "image") tryDecodeImage(m.payload) else None
        real match {
          case Some((w, h)) =>
            MediaFeatures(m.media_id, m.kind, n, width = w, height = h, frames = 1)
          case None =>
            // ??? <- COMPRESSED audio/video codecs (MP3/AAC/H.26x) go
            // here; WAV's codec IS raw PCM and decodes for real via
            // [[decodeWavPcm]] (q240) — the fake below covers only the
            // codecs this container genuinely lacks, deterministic in n:
            MediaFeatures(m.media_id, m.kind, n,
              width = (n % 640).toInt, height = (n % 480).toInt,
              frames = if (m.kind == "video") (n % 30 + 1).toInt else 1)
        }
      }
    }
  }
}
