package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the
  * pipeline as opaque `binary` payloads with typed metadata, processed
  * by per-partition batch functions over a typed `Dataset`.
  *
  * The IMAGE decode path is real: the JDK ships PNG/BMP/GIF/JPEG codecs
  * (`javax.imageio`), so `kind = "image"` payloads that parse as one of
  * those formats report their actual pixel dimensions. Audio/video
  * decode remains a clearly marked STUB (no such codecs in the JDK or
  * this container) — as is any image payload that no installed reader
  * accepts: both fall back to deterministic fake dimensions derived
  * from the payload length, so tests and the SQL oracle can verify the
  * plumbing end-to-end. Everything around the kernel is the real scale
  * design:
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
