package graft

import graft.api.Rag
import graft.sources.{DocSources, Multimodal}
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  test("multimodal: feature extraction preserves rows, hashes bytes, stubs decode") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")
      .as[Multimodal.MediaRecord]
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === media.count())
    val f = feats.find(_.media_id == 0L).get
    assert(f.mime === "image/png" && f.n_frames === 1)
    assert(f.width === 320 + (f.n_bytes % 16) * 80)
    assert(f.content_hash.matches("[0-9a-f]{32}"))
    val video = feats.find(_.mime == "video/mp4").get
    assert(video.n_frames > 0)
    val audio = feats.find(_.mime == "audio/wav").get
    assert(audio.n_frames === 0)
  }

  test("multimodal: frame sampling explodes every k-th frame of videos only") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")
        .as[Multimodal.MediaRecord])
    val frames = Multimodal.sampleFrames(feats, everyK = 10).collect()
    assert(frames.nonEmpty)
    val perVideo = frames.groupBy(_.getLong(0))
    val videos = feats.filter(_.mime == "video/mp4").collect()
    videos.foreach { v =>
      assert(perVideo(v.media_id).length === (v.n_frames + 9) / 10)
    }
    val nonVideoIds = feats.filter(_.mime != "video/mp4")
      .collect().map(_.media_id).toSet
    assert(frames.forall(r => !nonVideoIds.contains(r.getLong(0))))
  }

  test("doc sources: glob-filtered text scan decodes UTF-8 per file") {
    val dir = Files.createTempDirectory("graft_docs")
    Files.writeString(dir.resolve("a.txt"), "hello text")
    Files.writeString(dir.resolve("b.md"), "# markdown doc")
    Files.writeString(dir.resolve("skip.bin"), "binary noise")
    val docs = DocSources.textFiles(spark, dir.toString).collect()
    assert(docs.length === 2)
    val byName = docs.map(r => r.getString(0).split('/').last -> r.getString(1)).toMap
    assert(byName("a.txt") === "hello text")
    assert(byName("b.md") === "# markdown doc")
  }

  test("doc sources: pdf page stub splits on form-feed into 1-based pages") {
    val dir = Files.createTempDirectory("graft_pdfs")
    Files.writeString(dir.resolve("doc.pdf"), "page one\fpage two\fpage three")
    val pages = DocSources.pdfPagesStub(spark, dir.toString)
      .orderBy("page").collect()
    assert(pages.map(_.getInt(1)).toSeq === Seq(1, 2, 3))
    assert(pages.map(_.getString(2)).toSeq ===
      Seq("page one", "page two", "page three"))
  }

  test("doc sources: docx extraction reads w:t runs, paragraphs, tabs, breaks") {
    import graft.sources.DocxText
    val dir = Files.createTempDirectory("graft_docx")
    // a minimal but REAL .docx: zip with word/document.xml (OOXML layout)
    val xml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
        |<w:body>
        |<w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>world</w:t></w:r></w:p>
        |<w:p><w:r><w:t>col a</w:t><w:tab/><w:t>col b</w:t><w:br/><w:t>line 2</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    val out = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(dir.resolve("note.docx")))
    out.putNextEntry(new java.util.zip.ZipEntry("[Content_Types].xml"))
    out.write("<Types/>".getBytes("UTF-8"))
    out.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    out.write(xml.getBytes("UTF-8"))
    out.close()
    Files.writeString(dir.resolve("skip.txt"), "not a docx")

    val rows = DocSources.docxFiles(spark, dir.toString).collect()
    assert(rows.length === 1)
    assert(rows.head.getInt(1) === 1) // single page, ref etl/index_docs.py:27
    assert(rows.head.getString(2) ===
      "Hello world\n\ncol a\tcol b\nline 2")
    // corrupt payload → empty text, mirroring the reference's `or ""`
    assert(DocxText.extract("not a zip".getBytes) === "")
    // allDocs unions txt+pdf+docx under one (source, page, text) shape
    val all = DocSources.allDocs(spark, dir.toString).collect()
    assert(all.length === 2)
    assert(all.map(_.getString(0).split('/').last).toSet ===
      Set("note.docx", "skip.txt"))
  }

  test("corpus ingestion: deterministic ids, batched embeddings, parquet sink") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val store = Rag.ingestCorpus(docs, Rag.hashEmbedder)
    val rows = store.collect()
    assert(rows.length > docs.count()) // multiple chunks for longer docs
    val r = rows.head
    assert(r.getAs[String]("id") ===
      s"${r.getAs[String]("source")}::p0::c${r.getAs[Int]("chunk_idx")}")
    assert(rows.forall(_.getAs[Seq[Float]]("embedding").length === Rag.Dim))
    // sink round-trip (A6/A11)
    val path = Files.createTempDirectory("graft_store").toString + "/store"
    Rag.writeStore(store, path)
    val back = spark.read.parquet(path)
    assert(back.count() === rows.length)
    assert(back.schema.fieldNames.toSet ===
      Set("id", "doc_id", "chunk_idx", "text", "source", "embedding"))
  }

  test("WavCodec: encode/decode round-trip, chunk skipping, malformed rejection") {
    import graft.sources.WavCodec
    val bytes = WavCodec.synthesize(seed = 42L, ms = 300)
    val w = WavCodec.decode(bytes).get
    assert(w.sampleRate === 8000 && w.channels === 1 && w.bitsPerSample === 16)
    assert(w.nSamples === 2400L && w.durationMs === 300L)
    // samples match the closed form exactly (byte-level round trip)
    (0 until 2400).foreach { i =>
      val expect = (((1103515245L * i + 12345L * 42L) % 65536L) - 32768L).toShort
      assert(w.samples(i) === expect, s"sample $i")
    }
    // unknown chunks between fmt and data are skipped (real WAVs have LIST)
    val bb = java.nio.ByteBuffer.allocate(bytes.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(bytes, 0, 36) // RIFF..WAVE..fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0xdeadbeef)
    bb.put(bytes, 36, bytes.length - 36)
    val padded = bb.array()
    // fix the RIFF size field for the inserted chunk
    java.nio.ByteBuffer.wrap(padded).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, padded.length - 8)
    val w2 = WavCodec.decode(padded).get
    assert(w2.sumSquares === w.sumSquares && w2.nSamples === w.nSamples)
    // malformed payloads are None, never a throw
    assert(WavCodec.decode("not a wav".getBytes).isEmpty)
    assert(WavCodec.decode(bytes.take(20)).isEmpty)
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
    // rms framing: frame count = ceil(n/frameLen), energy positive
    val rms = w.rmsFrames(200) // 25ms at 8kHz
    assert(rms.length === 12 && rms.forall(_ > 0))
  }

  test("PngCodec: round-trips all five scanline filters, rejects malformed, resizes") {
    import graft.sources.PngCodec
    val w = 37; val h = 23 // odd sizes: exercise non-aligned rows
    val px = Array.tabulate(w * h)(i => ((7 * (i % w) + 13 * (i / w) + 5) % 256).toByte)
    val img = PngCodec.PngImage(w, h, px)
    (0 to 4).foreach { ft =>
      val back = PngCodec.decode(PngCodec.encode(img, ft)).get
      assert(back.width === w && back.height === h)
      assert(back.pixels.sameElements(px), s"filter $ft mangled pixels")
    }
    // malformed: bad signature, truncated, corrupted CRC
    assert(PngCodec.decode("nope".getBytes).isEmpty)
    val good = PngCodec.encode(img)
    assert(PngCodec.decode(good.take(30)).isEmpty)
    val corrupt = good.clone(); corrupt(20) = (corrupt(20) ^ 0xff).toByte
    assert(PngCodec.decode(corrupt).isEmpty) // CRC catches the flip
    // nearest-neighbor resize: corners preserved, dims exact
    val half = img.resize(18, 11)
    assert(half.width === 18 && half.height === 11)
    assert((half.pixels(0) & 0xff) === (px(0) & 0xff))
    assert(img.resize(w, h).pixels.sameElements(px)) // identity resize
  }

  test("imageFeatures decodes real PNG payloads in batched mapPartitions") {
    import spark.implicits._
    import graft.sources.{Multimodal, PngCodec}
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/png", PngCodec.synthesize(1L, 40, 30), "a"),
      Multimodal.MediaRecord(2L, "image/png", "junk".getBytes, "b"), // drops
    ).toDS()
    val feats = Multimodal.imageFeatures(media).collect()
    assert(feats.length === 1)
    val f = feats.head
    assert(f.width === 40 && f.height === 30 && f.n_pixels === 1200L)
    val expectSum = (for (y <- 0 until 30; x <- 0 until 40)
      yield (7L * x + 13L * y + 1L) % 256L).sum
    assert(f.pix_sum === expectSum)
  }

  test("Mp4Boxes: synthesize/parse round-trip, largesize, malformed rejection") {
    import graft.sources.Mp4Boxes
    val bytes = Mp4Boxes.synthesize(seed = 9L, nTracks = 2, durationMs = 3500)
    val m = Mp4Boxes.parse(bytes).get
    assert(m.brand === "isom" && m.timescale === 1000L)
    assert(m.durationMs === 3500L && m.nTracks === 2)
    // track dims: max over i of 320+((9+i)%8)*160 / 240+((9+i)%5)*120
    assert(m.maxWidth === math.max(320 + (9 % 8) * 160, 320 + (10 % 8) * 160))
    assert(m.maxHeight === math.max(240 + (9 % 5) * 120, 240 + (10 % 5) * 120))
    // sample tables, from the synthesis closed form (seed 9, tracks 0/1):
    // nf = 24+((9+i)%5)*12, delta = 33+(9+i)%10, kg = 8+(9+i)%5
    val nf = Seq(0, 1).map(i => 24 + ((9 + i) % 5) * 12)
    val delta = Seq(0, 1).map(i => 33 + (9 + i) % 10)
    val kg = Seq(0, 1).map(i => 8 + (9 + i) % 5)
    assert(m.nFrames === nf.sum.toLong)
    assert(m.sampleTicks === nf.zip(delta).map { case (n, dl) => n * dl }.sum.toLong)
    assert(m.nKeyframes === nf.zip(kg).map { case (n, g) => (n + g - 1) / g }.sum.toLong)
    val bytesExpect = (for { i <- 0 to 1; j <- 0 until nf(i) }
      yield 800L + (9 + 31 * i + 7 * j) % 512).sum
    assert(m.sampleBytes === bytesExpect)
    assert(m.bitrateBps === bytesExpect * 8 * 1000 / m.sampleTicks)
    // spec rule: a trak with NO stss is all-keyframes — strip the stss
    // boxes and the keyframe count must equal the frame count
    val noStss = {
      def strip(bs: Array[Byte]): Array[Byte] = {
        val buf = scala.collection.mutable.ArrayBuffer[Byte]()
        var off = 0
        while (off + 8 <= bs.length) {
          val size = java.nio.ByteBuffer.wrap(bs, off, 4).getInt
          val tag = new String(bs, off + 4, 4, "US-ASCII")
          val body = bs.slice(off + 8, off + size)
          tag match {
            case "stss" => () // drop
            case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
              val inner = strip(body)
              val hdr = java.nio.ByteBuffer.allocate(8)
                .putInt(8 + inner.length).put(tag.getBytes("US-ASCII"))
              buf ++= hdr.array(); buf ++= inner
            case _ =>
              buf ++= bs.slice(off, off + size)
          }
          off += size
        }
        buf.toArray
      }
      strip(bytes)
    }
    val mNoStss = Mp4Boxes.parse(noStss).get
    assert(mNoStss.nKeyframes === mNoStss.nFrames)
    // a 64-bit largesize moov header parses identically: rewrite
    // (size32, 'moov') as (1, 'moov', largesize64) with the same payload
    val ftypLen = java.nio.ByteBuffer.wrap(bytes).getInt // ftyp box size
    val moov = bytes.drop(ftypLen)
    val moovPayload = moov.drop(8)
    val big = {
      val bb = java.nio.ByteBuffer.allocate(16 + moovPayload.length)
      bb.putInt(1).put("moov".getBytes("US-ASCII"))
        .putLong(16L + moovPayload.length).put(moovPayload)
      bytes.take(ftypLen) ++ bb.array()
    }
    val mBig = Mp4Boxes.parse(big).get
    assert(mBig === m.copy()) // identical metadata through the 64-bit path
    // malformed: truncation and garbage return None, never throw
    assert(Mp4Boxes.parse(bytes.take(30)).isEmpty)
    assert(Mp4Boxes.parse("not an mp4 at all".getBytes).isEmpty)
    assert(Mp4Boxes.parse(Array.emptyByteArray).isEmpty)
  }

  test("Mp4Boxes.rawFrames resolves real stsc/stco offsets to pixel bytes") {
    import graft.sources.Mp4Boxes
    val seed = 21L
    val bytes = Mp4Boxes.synthesizeFrames(seed)
    val rf = Mp4Boxes.rawFrames(bytes).get
    val (w, h, nf) = ((16 + seed % 16).toInt, (12 + seed % 12).toInt,
      (8 + seed % 8).toInt)
    assert(rf.width === w && rf.height === h && rf.frames.length === nf)
    // every pixel byte of every frame matches the closed form — the bytes
    // really came from mdat at the stco-resolved offsets
    for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
      assert((rf.frames(f)(y * w + x) & 0xff) ===
        ((7 * x + 13 * y + 31 * f + seed) % 256).toInt)
    // the same payload still yields container metadata (single raw track)
    val meta = Mp4Boxes.parse(bytes).get
    assert(meta.nTracks === 1 && meta.nFrames === nf.toLong)
    assert(meta.sampleBytes === nf.toLong * w * h)
    // truncated mdat: offsets point past the end -> None, never throw
    assert(Mp4Boxes.rawFrames(bytes.dropRight(w * h)).isEmpty)
    // metadata-only synthesis has no raw frame track shape
    assert(Mp4Boxes.rawFrames(Mp4Boxes.synthesize(9L, 2, 3500)).isEmpty)
  }

  test("videoMeta parses real MP4 payloads in batched mapPartitions") {
    import spark.implicits._
    import graft.sources.{Mp4Boxes, Multimodal}
    val media = Seq(
      Multimodal.MediaRecord(1L, "video/mp4", Mp4Boxes.synthesize(1L, 1, 2000), "a"),
      Multimodal.MediaRecord(2L, "video/mp4", "junk".getBytes, "b"), // drops
    ).toDS()
    val metas = Multimodal.videoMeta(media).collect()
    assert(metas.length === 1)
    assert(metas.head.duration_ms === 2000L && metas.head.n_tracks === 1)
  }

  test("audioFeatures decodes real WAV payloads in batched mapPartitions") {
    import spark.implicits._
    import graft.sources.{Multimodal, WavCodec}
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio/wav", WavCodec.synthesize(1L, 200), "a"),
      Multimodal.MediaRecord(2L, "audio/wav", WavCodec.synthesize(2L, 400), "b"),
      Multimodal.MediaRecord(3L, "audio/wav", "junk".getBytes, "c"), // drops
    ).toDS()
    val feats = Multimodal.audioFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats.keySet === Set(1L, 2L)) // malformed row skipped
    assert(feats(1L).duration_ms === 200L && feats(2L).duration_ms === 400L)
    assert(feats(1L).sum_sq === WavCodec.decode(
      WavCodec.synthesize(1L, 200)).get.sumSquares)
    assert(feats(2L).peak <= 32768 && feats(2L).peak > 0)
  }

  test("codec property sweep: random dims/content round-trip exactly") {
    import graft.sources.{Mp4Boxes, PngCodec, WavCodec}
    val rnd = new scala.util.Random(123)
    (1 to 20).foreach { _ =>
      val w = 1 + rnd.nextInt(100); val h = 1 + rnd.nextInt(80)
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val ft = rnd.nextInt(5)
      val back = PngCodec.decode(
        PngCodec.encode(PngCodec.PngImage(w, h, px), ft)).get
      assert(back.width === w && back.height === h &&
        back.pixels.sameElements(px), s"png ${w}x$h filter $ft")
    }
    (1 to 20).foreach { _ =>
      val seed = rnd.nextLong().abs; val ms = 1 + rnd.nextInt(500)
      val wav = WavCodec.decode(WavCodec.synthesize(seed, ms)).get
      assert(wav.nSamples === 8000L * ms / 1000, s"wav seed=$seed ms=$ms")
      // decoder output == closed form for a sampled position
      val i = rnd.nextInt(math.max(wav.samples.length, 1))
      val expect = (((1103515245L * i + 12345L * seed) % 65536L) - 32768L).toShort
      if (wav.samples.nonEmpty) assert(wav.samples(i) === expect)
    }
    (1 to 20).foreach { _ =>
      val seed = rnd.nextLong().abs
      val nt = 1 + rnd.nextInt(4); val dur = (1 + rnd.nextInt(600)) * 100L
      val m = Mp4Boxes.parse(Mp4Boxes.synthesize(seed, nt, dur)).get
      assert(m.nTracks === nt && m.durationMs === dur, s"mp4 seed=$seed")
    }
    // NEGATIVE seeds must synthesize valid boxes too (floorMod): the %
    // formulation allocated a negative stsz buffer for e.g. -13
    Seq(-13L, -1L, Long.MinValue + 7).foreach { seed =>
      val m = Mp4Boxes.parse(Mp4Boxes.synthesize(seed, 2, 1500)).get
      assert(m.nTracks === 2 && m.durationMs === 1500, s"neg seed=$seed")
      assert(m.maxWidth > 0 && m.nFrames > 0)
    }
  }

  test("mp4 stts ticks normalize from the mdhd media timescale to movie ticks") {
    import graft.sources.Mp4Boxes
    import java.nio.ByteBuffer
    def box(tag: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tag.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    // movie timescale 1000; the track's MEDIA timescale 90000 (the real
    // video-track shape): 90000 stts ticks = 1 s = 1000 movie ticks
    val mvhd = {
      val bb = ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0).putInt(1000).putInt(1000)
      box("mvhd", bb.array())
    }
    val mdhd = {
      val bb = ByteBuffer.allocate(24)
      bb.putInt(0).putInt(0).putInt(0).putInt(90000).putInt(90000)
      box("mdhd", bb.array())
    }
    val stts = { // 30 samples × 3000 media ticks = 90000 ticks = 1 s
      val bb = ByteBuffer.allocate(16)
      bb.putInt(0).putInt(1).putInt(30).putInt(3000)
      box("stts", bb.array())
    }
    val stsz = { // fixed 1000-byte samples → 30 kB payload
      val bb = ByteBuffer.allocate(12)
      bb.putInt(0).putInt(1000).putInt(30)
      box("stsz", bb.array())
    }
    val trak = box("trak",
      box("mdia", mdhd ++ box("minf", box("stbl", stts ++ stsz))))
    val m = Mp4Boxes.parse(box("moov", mvhd ++ trak)).get
    assert(m.sampleTicks === 1000L, s"got ${m.sampleTicks}") // movie ticks
    // 30 kB over 1 s → 240 kbit/s (was ~90× understated pre-normalization)
    assert(m.bitrateBps === 30000L * 8)
  }

  test("events loader normalizes TIMESTAMP_NTZ files (other engines' writers)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.TimestampType
    // a DuckDB-written events.parquet carries TIMESTAMP(MICROS) without
    // timezone — Spark reads TIMESTAMP_NTZ, which instant functions reject
    val dir = Files.createTempDirectory("graft_ntz").toString
    spark.sql(
      """SELECT CAST(1 AS BIGINT) AS event_id,
        |       TIMESTAMP_NTZ '2024-03-01 12:30:00' AS ts,
        |       CAST(7 AS BIGINT) AS user_id,
        |       'view' AS event_type, 1.5 AS value, '{}' AS props""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = graft.core.Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    // UTC session tz: the NTZ wall-clock is the instant
    val ms = ev.select(unix_millis(col("ts"))).head().getLong(0)
    assert(ms === java.time.Instant.parse("2024-03-01T12:30:00Z").toEpochMilli)
  }
}
