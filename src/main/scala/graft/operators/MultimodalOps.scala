package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** An opaque media payload with typed metadata — the multimodal column
  * pattern: binary blob + schema'd sidecar fields. */
case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)

/** Output of the (stubbed) decode/feature-extract stage. */
case class MediaFeatures(doc_id: Long, n_bytes: Int, n_frames: Int, checksum: Long)

/** Multimodal-column plumbing (builder-prompt mandate).
  *
  * Real deployments decode image/audio/video payloads with native libs inside
  * a partition-mapping UDF; those libs are absent in this container, so
  * `decodeStub` is a DETERMINISTIC STAND-IN ("frames" = 32-byte chunks,
  * checksum = byte sum) — but the Spark-side shape is the real thing: typed
  * Dataset in, mapPartitions (iterator → iterator, batch-friendly, zero
  * driver involvement) out, so swapping in a real decoder touches only the
  * lambda body.
  *
  * Scale: mapPartitions keeps the decode batched per partition; payload
  * columns stay off the shuffle path (features are extracted before any
  * wide operation downstream would touch them).
  */
object MultimodalOps {

  /** documents.text re-materialized as an opaque binary payload column. */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("media_type"))
      .as[MediaRecord]
  }

  /** STUB decode stage — deterministic fake of a media decoder (see object
    * Scaladoc). */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val n = r.payload.length
      MediaFeatures(r.doc_id, n, (n + 31) / 32, r.payload.map(_.toLong & 0xffL).sum)
    })
  }
}
