package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns travelling next to typed metadata. The Spark-side
  * machinery — schema, partition-sized batching, per-partition decode calls,
  * feature schema — is real; the actual media decode is STUBBED (this
  * container ships no image/audio codecs) behind [[MediaDecoder]] with a
  * deterministic fake so tests pin the plumbing.
  *
  * Scale notes: payloads stay in executor space end-to-end (no collect);
  * decode runs once per row inside `mapPartitions` so per-partition
  * decoder initialization (the expensive part with a real codec) is
  * amortized; `spark.sql.files.maxPartitionBytes` bounds the bytes a task
  * holds.
  */
object Multimodal {

  /** One media row: payload + metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (what a real decoder would produce per frame/clip). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Decoder contract. A production deployment plugs a codec (JNI/FFI) in
    * here; the stub derives deterministic pseudo-features from the bytes so
    * the distributed plumbing is testable without codecs.
    */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) // (width, height, frames)
  }

  /** Deterministic fake: "dimensions" derived from payload length and first
    * bytes. Replace with a real decoder outside this container.
    */
  object StubDecoder extends MediaDecoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val len = payload.length
      val b0 = if (len > 0) payload(0) & 0xff else 0
      (64 + (b0 % 64), 64 + (len % 64), if (kind == "video") 1 + (len % 30) else 1)
    }
  }

  /** Per-partition feature extraction. The decoder is constructed once per
    * partition (closure-captured object), mirroring real codec-handle reuse.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (w, h, f) = decoder.decode(r.kind, r.payload)
        md.reset()
        val sum = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.kind, r.payload.length, sum, w, h, f)
      }
    }
  }

  /** Build a media table from the documents fixture: payload = utf-8 bytes
    * of the text (a stand-in for real image bytes; the binary column type
    * and everything downstream is the real thing).
    */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "video").otherwise("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
