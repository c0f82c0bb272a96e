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
  def mp4Bytes(timescale: Int, duration: Long, frames: Int,
      mvhdVersion: Int = 0, audioFramesFirst: Option[Int] = None): Array[Byte] = {
    require(timescale > 0 && duration >= 0 && frames >= 0)
    require(mvhdVersion == 0 || mvhdVersion == 1)
    val mvhdBody = {
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
    val traks = audioFramesFirst.map(trakBytes("soun", _))
      .getOrElse(Array.emptyByteArray) ++ trakBytes("vide", frames)
    val ftyp = isoBox("ftyp",
      "isom".getBytes ++ Array.fill(4)(0: Byte) ++ "isom".getBytes)
    val moov = isoBox("moov", isoBox("mvhd", mvhdBody) ++ traks)
    val mdat = isoBox("mdat", Array.tabulate(8)(i => (i * 7).toByte))
    ftyp ++ moov ++ mdat
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
    * to the stub model. Frame byte-ranges remain the uniform
    * `n / frames` model — real per-sample ranges need the stsz SIZE
    * table + stco chunk offsets, the documented next step at this
    * codec boundary. Same scale shape as [[frameSample]]: the parse is
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
            // ??? <- audio/video codec goes here; fake is deterministic in n:
            MediaFeatures(m.media_id, m.kind, n,
              width = (n % 640).toInt, height = (n % 480).toInt,
              frames = if (m.kind == "video") (n % 30 + 1).toInt else 1)
        }
      }
    }
  }
}
