package graft.operators

import graft.api.Rag
import graft.core.Q
import graft.intent.SalesView
import graft.sources.Multimodal
import org.apache.spark.sql.functions._

/** Catalog entries for the multimodal and ingestion plumbing. */
object MediaQueries {

  /** Multimodal feature extraction over binary media columns via batched
    * mapPartitions; the decode stub's outputs are recomputed arithmetically
    * by the oracle, so the whole binary → features path is checked.
    */
  val q86MultimodalFeatures = Q(
    "q86_multimodal_features",
    (s, d) => {
      import s.implicits._
      Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(s, d).as[Multimodal.MediaRecord]).toDF()
    },
    Some("""
      SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
               ELSE 'video/mp4' END AS mime,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS content_hash,
             CAST(320 + (octet_length(encode(text)) % 16) * 80 AS INT) AS width,
             CAST(240 + (octet_length(encode(text)) % 9) * 60 AS INT) AS height,
             CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + octet_length(encode(text)) % 240
                       WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS n_frames
      FROM documents
    """),
  )

  /** Corpus ingestion (chunk → batched embed → content-derived ids): the
    * id scheme, chunk boundaries, and vector dimensionality are
    * oracle-checked; vector VALUES are engine-side only (see AskAiSpec for
    * the embedder's determinism properties).
    */
  val q87CorpusIngest = Q(
    "q87_corpus_ingest",
    (s, d) =>
      Rag.ingestCorpus(graft.core.Tables.documents(s, d), Rag.hashEmbedder)
        .select(col("id"), col("doc_id"), col("chunk_idx"),
          length(col("text")).as("n_chars"),
          size(col("embedding")).as("dim")),
    Some("""
      WITH norm AS (
        SELECT doc_id, source,
               lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
        FROM documents),
      n AS (SELECT doc_id, source, norm, length(norm) AS len FROM norm),
      idx AS (
        SELECT doc_id, CAST(i AS INT) AS chunk_idx
        FROM n CROSS JOIN (SELECT unnest(range(0, 64)) AS i) r
        WHERE i * 160 < len)
      SELECT n.source || '::p' || CAST(idx.doc_id AS VARCHAR)
               || '::c' || CAST(chunk_idx AS VARCHAR) AS id,
             idx.doc_id, chunk_idx,
             CAST(length(substr(n.norm, chunk_idx * 160 + 1, 200)) AS INT) AS n_chars,
             64 AS dim
      FROM idx JOIN n ON idx.doc_id = n.doc_id
    """),
  )

  /** REAL audio decode over the binary column: each audio doc carries an
    * actual RIFF/WAVE PCM16 payload (synthesized from an integer-only
    * closed-form waveform), the engine walks the RIFF chunks and decodes
    * the samples with the pure-JDK [[graft.sources.WavCodec]], and the
    * oracle recomputes the decoded samples' exact integer features from
    * the same closed form — any byte the writer or parser mangles flips
    * the sum-of-squares and fails the hash. Duration varies per doc
    * (200–900 ms) so chunk sizes differ across rows.
    */
  val q117AudioFeatures = Q(
    "q117_audio_features",
    (s, d) => {
      import s.implicits._
      val synth = udf((id: Long) =>
        graft.sources.WavCodec.synthesize(id, (200 + (id % 8) * 100).toInt))
      val media = graft.core.Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 1)
        .select(
          col("doc_id").as("media_id"),
          lit("audio/wav").as("mime"),
          synth(col("doc_id")).as("content"),
          col("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.audioFeatures(media).toDF()
    },
    Some("""
      WITH a AS (
        SELECT doc_id, 1600 + (doc_id % 8) * 800 AS n
        FROM documents WHERE doc_id % 3 = 1),
      grid AS (SELECT CAST(unnest(range(0,
                (SELECT max(n) FROM a))) AS BIGINT) AS i),
      samp AS (
        SELECT doc_id, ((1103515245 * i + 12345 * doc_id) % 65536) - 32768 AS v
        FROM a JOIN grid ON i < n),
      feat AS (
        SELECT doc_id, count(*) AS n_samples,
               CAST(SUM(v * v) AS BIGINT) AS sum_sq,
               CAST(MAX(abs(v)) AS INT) AS peak
        FROM samp GROUP BY doc_id)
      SELECT doc_id AS media_id, 8000 AS sample_rate, 1 AS n_channels,
             16 AS bits, n_samples,
             CAST(n_samples * 1000 // 8000 AS BIGINT) AS duration_ms,
             sum_sq, peak
      FROM feat
    """),
  )

  /** REAL image decode over the binary column: each image doc carries an
    * actual 8-bit grayscale PNG (synthesized from the closed form
    * pixel(x,y) = (7x + 13y + doc_id) mod 256), the engine walks the
    * chunks, validates CRCs, inflates, and unfilters with the pure-JDK
    * [[graft.sources.PngCodec]], and the oracle recomputes the decoded
    * pixels' exact integer features from the same closed form. Dimensions
    * vary per doc so scanline lengths differ across rows.
    */
  val q118ImageFeatures = Q(
    "q118_image_features",
    (s, d) => {
      import s.implicits._
      val synth = udf((id: Long) => graft.sources.PngCodec.synthesize(
        id, (32 + id % 32).toInt, (24 + id % 24).toInt))
      val media = graft.core.Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 0)
        .select(
          col("doc_id").as("media_id"),
          lit("image/png").as("mime"),
          synth(col("doc_id")).as("content"),
          col("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.imageFeatures(media).toDF()
    },
    Some("""
      WITH im AS (
        SELECT doc_id, 32 + doc_id % 32 AS w, 24 + doc_id % 24 AS h
        FROM documents WHERE doc_id % 3 = 0),
      gx AS (SELECT CAST(unnest(range(0, (SELECT max(w) FROM im))) AS BIGINT) AS x),
      gy AS (SELECT CAST(unnest(range(0, (SELECT max(h) FROM im))) AS BIGINT) AS y),
      px AS (
        SELECT doc_id, (7 * x + 13 * y + doc_id) % 256 AS v
        FROM im JOIN gx ON x < w JOIN gy ON y < h),
      feat AS (
        SELECT doc_id, count(*) AS n_pixels, CAST(SUM(v) AS BIGINT) AS pix_sum,
               CAST(MIN(v) AS INT) AS pix_min, CAST(MAX(v) AS INT) AS pix_max
        FROM px GROUP BY doc_id)
      SELECT im.doc_id AS media_id, CAST(w AS INT) AS width,
             CAST(h AS INT) AS height, n_pixels, pix_sum, pix_min, pix_max
      FROM feat JOIN im ON feat.doc_id = im.doc_id
    """),
  )

  /** REAL video container parsing over the binary column: each video doc
    * carries a spec-valid MP4 box tree
    * (ftyp + moov(mvhd + trak(tkhd + mdia(minf(stbl(stts stsz stss))))*)),
    * the engine walks the boxes with the pure-JDK
    * [[graft.sources.Mp4Boxes]] and extracts ffprobe-level metadata —
    * including per-track frame counts, payload bytes, duration-weighted
    * bitrate, and keyframe counts read from the sample tables, no codec
    * needed — and the oracle recomputes every field from the synthesis
    * closed form (per-frame sizes via a range join, the q117/q118
    * pattern) — a mis-parsed box offset shifts any of them and fails the
    * hash. Track counts, dimensions, frame counts, and strides vary per
    * doc.
    */
  val q120VideoMetadata = Q(
    "q120_video_metadata",
    (s, d) => {
      import s.implicits._
      val synth = udf((id: Long) => graft.sources.Mp4Boxes.synthesize(
        id, (1 + id % 3).toInt, 1000 + (id % 20) * 500))
      val media = graft.core.Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 2)
        .select(
          col("doc_id").as("media_id"),
          lit("video/mp4").as("mime"),
          synth(col("doc_id")).as("content"),
          col("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.videoMeta(media).toDF()
    },
    Some("""
      WITH v AS (
        SELECT doc_id, 1 + doc_id % 3 AS nt, 1000 + (doc_id % 20) * 500 AS dur
        FROM documents WHERE doc_id % 3 = 2),
      g AS (SELECT CAST(unnest(range(0, 3)) AS BIGINT) AS i),
      t AS (
        SELECT doc_id, nt, dur, i,
               320 + ((doc_id + i) % 8) * 160 AS w,
               240 + ((doc_id + i) % 5) * 120 AS h,
               24 + ((doc_id + i) % 5) * 12 AS nf,
               33 + (doc_id + i) % 10 AS delta,
               8 + (doc_id + i) % 5 AS kg
        FROM v JOIN g ON i < nt),
      fj AS (SELECT CAST(unnest(range(0, 72)) AS BIGINT) AS j),
      fb AS (
        SELECT t.doc_id,
               sum(800 + (t.doc_id + 31 * t.i + 7 * j) % 512) AS sample_bytes
        FROM t JOIN fj ON j < t.nf GROUP BY t.doc_id),
      agg AS (
        SELECT doc_id, min(nt) AS nt, min(dur) AS dur,
               max(w) AS w, max(h) AS h,
               sum(nf) AS nf, sum(nf * delta) AS ticks,
               sum((nf + kg - 1) // kg) AS nk
        FROM t GROUP BY doc_id)
      SELECT agg.doc_id AS media_id, 'isom' AS brand,
             CAST(1000 AS BIGINT) AS timescale,
             CAST(dur AS BIGINT) AS duration_ms,
             CAST(nt AS INT) AS n_tracks,
             CAST(w AS INT) AS max_width,
             CAST(h AS INT) AS max_height,
             CAST(nf AS BIGINT) AS n_frames,
             CAST(nk AS BIGINT) AS n_keyframes,
             CAST(fb.sample_bytes AS BIGINT) AS sample_bytes,
             CAST(fb.sample_bytes * 8 * 1000 // ticks AS BIGINT) AS bitrate_bps
      FROM agg JOIN fb ON agg.doc_id = fb.doc_id
    """),
  )

  /** REAL video frame extraction, codec-free: each video doc carries raw
    * gray8 frames as actual pixel bytes in mdat, addressed by real
    * stsz/stsc/stco sample tables (fixed sample size, one chunk, absolute
    * file offset). The engine resolves the offsets with
    * [[graft.sources.Mp4Boxes.rawFrames]], decodes every 4th frame, and
    * the oracle recomputes the sampled pixels' exact integer luma stats
    * from the synthesis closed form pixel(x,y,f) = (7x+13y+31f+id)%256 —
    * a wrong stco offset or stsc run shifts every pixel and fails the
    * hash. Compressed tracks (H.264) remain the one out-of-scope decode.
    */
  val q123VideoFrames = Q(
    "q123_video_frames",
    (s, d) => {
      import s.implicits._
      val synth = udf((id: Long) => graft.sources.Mp4Boxes.synthesizeFrames(id))
      val media = graft.core.Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 2)
        .select(
          col("doc_id").as("media_id"),
          lit("video/mp4").as("mime"),
          synth(col("doc_id")).as("content"),
          col("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.videoFrameStats(media, every = 4).toDF()
    },
    Some("""
      WITH v AS (
        SELECT doc_id, 16 + doc_id % 16 AS w, 12 + doc_id % 12 AS h,
               8 + doc_id % 8 AS nf
        FROM documents WHERE doc_id % 3 = 2),
      gx AS (SELECT CAST(unnest(range(0, 32)) AS BIGINT) AS x),
      gy AS (SELECT CAST(unnest(range(0, 24)) AS BIGINT) AS y),
      gf AS (SELECT CAST(unnest(range(0, 16, 4)) AS BIGINT) AS f),
      px AS (
        SELECT v.doc_id, (7 * x + 13 * y + 31 * f + v.doc_id) % 256 AS p
        FROM v JOIN gx ON x < w JOIN gy ON y < h JOIN gf ON f < nf),
      agg AS (
        SELECT doc_id, CAST(sum(p) AS BIGINT) AS luma_sum,
               CAST(min(p) AS INT) AS luma_min,
               CAST(max(p) AS INT) AS luma_max
        FROM px GROUP BY doc_id)
      SELECT v.doc_id AS media_id, CAST(w AS INT) AS width,
             CAST(h AS INT) AS height, CAST(nf AS INT) AS n_frames,
             CAST((nf + 3) // 4 AS INT) AS n_sampled,
             luma_sum, luma_min, luma_max
      FROM agg JOIN v ON agg.doc_id = v.doc_id
    """),
  )

  val all: Seq[Q] = Seq(q86MultimodalFeatures, q87CorpusIngest,
    q117AudioFeatures, q118ImageFeatures, q120VideoMetadata, q123VideoFrames)
}
