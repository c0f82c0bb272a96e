package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the
  * pipeline as opaque `binary` payloads with typed metadata, processed
  * by per-partition batch functions over a typed `Dataset`.
  *
  * The decode kernel is a clearly marked STUB — this container has no
  * image/audio codecs, so [[decodeStub]] derives deterministic fake
  * dimensions from the payload length. Everything AROUND the stub is
  * the real scale design:
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

  /** STUB decode: real deployments replace the body with an actual
    * codec call (e.g. javax.imageio / ffmpeg bindings); dimensions here
    * are a deterministic function of payload length so tests and the
    * SQL oracle can verify the plumbing end-to-end. */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { m =>
        val n = m.payload.length.toLong
        // ??? <- codec goes here; fake is deterministic in n:
        MediaFeatures(m.media_id, m.kind, n,
          width = (n % 640).toInt, height = (n % 480).toInt,
          frames = if (m.kind == "video") (n % 30 + 1).toInt else 1)
      }
    }
  }
}
