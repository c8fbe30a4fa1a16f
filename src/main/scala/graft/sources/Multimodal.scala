package graft.sources

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by batched `mapPartitions` (the Scala
  * analogue of a batched pandas UDF: partition-local iteration in fixed-size
  * batches, one output row per input row).
  *
  * The DECODE STEP IS A DETERMINISTIC STUB — this container has no
  * image/audio codecs. [[decodeStub]] derives (width, height, frames) from
  * the byte payload arithmetically so the pipeline is end-to-end testable
  * and oracle-checkable; a real deployment swaps `decodeStub` for a codec
  * call with the SAME signature, and nothing else changes. The Spark-side
  * shape — binary schema, batching, partition distribution — is real.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long, mime: String, content: Array[Byte], source: String)

  final case class MediaFeatures(
      media_id: Long, mime: String, n_bytes: Long, content_hash: String,
      width: Int, height: Int, n_frames: Int)

  /** STUB decoder (would be a codec in production): deterministic pseudo
    * dimensions from payload size; frame count only for video.
    */
  def decodeStub(mime: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val width = 320 + (n % 16) * 80
    val height = 240 + (n % 9) * 60
    val frames = mime match {
      case "video/mp4" => 1 + n % 240
      case "image/png" => 1
      case _           => 0 // audio
    }
    (width, height, frames)
  }

  /** A media table derived from `documents` (the testdata carries no real
    * binaries): UTF-8 payload as the opaque binary column, mime cycling
    * through the three modalities.
    */
  def mediaFromDocuments(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      encode(col("text"), "UTF-8").as("content"),
      col("source"))

  /** Batched feature extraction over the binary column — partition-local,
    * batch size 32 (mirrors the reference ingestion batching,
    * `api/ingest_docs.py:12-15`). One shuffle-free pass.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(32).flatMap { batch =>
        // a real decoder would process `batch` as one vectorized call
        batch.iterator.map { r =>
          val (w, h, f) = decodeStub(r.mime, r.content)
          val hash = java.security.MessageDigest.getInstance("MD5")
            .digest(r.content).map("%02x".format(_)).mkString
          MediaFeatures(r.media_id, r.mime, r.content.length.toLong, hash, w, h, f)
        }
      }
    }
  }

  final case class AudioFeatures(
      media_id: Long, sample_rate: Int, n_channels: Int, bits: Int,
      n_samples: Long, duration_ms: Long, sum_sq: Long, peak: Int)

  /** REAL audio decode + feature extraction — WAV/RIFF PCM16 parses with
    * the pure-JDK [[WavCodec]] (no external codec needed), so the audio
    * modality is no longer stubbed: each payload's RIFF chunks are walked,
    * PCM samples decoded, and exact integer features (sum of squares,
    * peak) extracted in the same batched mapPartitions shape as
    * [[extractFeatures]]. Unparseable payloads drop (skip-on-error).
    */
  def audioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(32).flatMap { batch =>
        batch.iterator.flatMap { r =>
          WavCodec.decode(r.content).map { w =>
            AudioFeatures(r.media_id, w.sampleRate, w.channels,
              w.bitsPerSample, w.nSamples, w.durationMs, w.sumSquares, w.peak)
          }
        }
      }
    }
  }

  final case class ImageFeatures(
      media_id: Long, width: Int, height: Int,
      n_pixels: Long, pix_sum: Long, pix_min: Int, pix_max: Int)

  /** REAL image decode + feature extraction — 8-bit grayscale PNG parses
    * with the pure-JDK [[PngCodec]] (zlib is in `java.util.zip`): chunk
    * walk, CRC checks, inflate, all five scanline filters. Same batched
    * shape; unparseable payloads drop.
    */
  def imageFeatures(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(32).flatMap { batch =>
        batch.iterator.flatMap { r =>
          PngCodec.decode(r.content).map { im =>
            ImageFeatures(r.media_id, im.width, im.height,
              im.nPixels, im.pixelSum, im.pixelMin, im.pixelMax)
          }
        }
      }
    }
  }

  final case class VideoMeta(
      media_id: Long, brand: String, timescale: Long, duration_ms: Long,
      n_tracks: Int, max_width: Int, max_height: Int,
      n_frames: Long, n_keyframes: Long, sample_bytes: Long,
      bitrate_bps: Long)

  /** REAL video container parsing — MP4/ISO-BMFF box walk via the
    * pure-JDK [[Mp4Boxes]] (ftyp/moov/mvhd/trak/tkhd + the stbl sample
    * tables stts/stsz/stss): duration, timescale, track count,
    * dimensions, frame count, payload bytes, duration-weighted bitrate,
    * keyframe count — everything ffprobe reports without a codec. Only
    * frame DECODE stays out of scope (needs H.264). Unparseable payloads
    * drop.
    */
  def videoMeta(media: Dataset[MediaRecord]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(32).flatMap { batch =>
        batch.iterator.flatMap { r =>
          Mp4Boxes.parse(r.content).map { m =>
            VideoMeta(r.media_id, m.brand, m.timescale, m.durationMs,
              m.nTracks, m.maxWidth, m.maxHeight,
              m.nFrames, m.nKeyframes, m.sampleBytes, m.bitrateBps)
          }
        }
      }
    }
  }

  final case class VideoFrameStats(
      media_id: Long, width: Int, height: Int, n_frames: Int,
      n_sampled: Int, luma_sum: Long, luma_min: Int, luma_max: Int)

  /** REAL frame extraction for codec-free (raw gray8) video tracks: the
    * frames live as actual pixel bytes in mdat, located through the real
    * stsz/stsc/stco sample tables via [[Mp4Boxes.rawFrames]] — the same
    * real-bytes discipline as WAV/PNG. Every `every`-th frame (from frame
    * 0) is decoded and per-video luma statistics accumulate over the
    * sampled pixels. COMPRESSED tracks stay out of scope (H.264); they
    * return None from rawFrames and drop, exactly like unparseable
    * payloads elsewhere.
    */
  def videoFrameStats(media: Dataset[MediaRecord], every: Int): Dataset[VideoFrameStats] = {
    require(every >= 1, s"every must be >= 1, got $every")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(32).flatMap { batch =>
        batch.iterator.flatMap { r =>
          Mp4Boxes.rawFrames(r.content).map { rf =>
            var sum = 0L; var mn = 255; var mx = 0; var sampled = 0
            var f = 0
            while (f < rf.frames.length) {
              val px = rf.frames(f)
              var i = 0
              while (i < px.length) {
                val v = px(i) & 0xff
                sum += v
                if (v < mn) mn = v
                if (v > mx) mx = v
                i += 1
              }
              sampled += 1
              f += every
            }
            VideoFrameStats(r.media_id, rf.width, rf.height,
              rf.frames.length, sampled, sum, mn, mx)
          }
        }
      }
    }
  }

  /** Frame sampling for video payloads: every k-th frame index up to the
    * stub's frame count — an exploded (media_id, frame_idx) frame, the
    * shape a real frame extractor feeds downstream.
    */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int): DataFrame = {
    // fail at the driver with a clear message, not as a wrapped
    // IllegalArgumentException("step cannot be 0") inside an executor task
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    import features.sparkSession.implicits._
    features.filter(_.mime == "video/mp4")
      .flatMap(f => (0 until f.n_frames by everyK).map(i => (f.media_id, i)))
      .toDF("media_id", "frame_idx")
  }
}
