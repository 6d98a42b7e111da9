package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abcdefgh" * 8),   // 64 bytes
    (1L, "xy"),
    (2L, "0123456789abcdef")).toDF("doc_id", "text")

  test("attachMedia: opaque binary + typed metadata, deterministic type") {
    val m = Multimodal.attachMedia(docs).orderBy("doc_id").collect()
    m.map(_.getAs[String]("media_type")) shouldBe Array("image", "audio", "video")
    m(0).getAs[Int]("n_bytes") shouldBe 64
    m(0).getAs[Array[Byte]]("media").length shouldBe 64
  }

  test("extractFeatures: one decoder pass per partition, typed output") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.attachMedia(docs))
      .collect().sortBy(_.doc_id)
    feats.length shouldBe 3
    feats(0).features.length shouldBe 8
    // deterministic stub: same payload -> same features
    val again = Multimodal.extractFeatures(spark, Multimodal.attachMedia(docs))
      .collect().sortBy(_.doc_id)
    feats(0).features.toSeq shouldBe again(0).features.toSeq
    feats(0).n_frames shouldBe 1
  }

  test("encodeBmp -> decodeImageFeatures roundtrips exact stats") {
    val bytes = Multimodal.encodeBmp(5, 3, 200, 100, 50)
    bytes.take(2).map(_.toChar).mkString shouldBe "BM" // real BMP header
    val f = Multimodal.decodeImageFeatures(bytes).get
    f(0) shouldBe 5f; f(1) shouldBe 3f; f(2) shouldBe 3f
    f(3) shouldBe 200f; f(4) shouldBe 100f; f(5) shouldBe 50f
    f(6) shouldBe ((200 + 100 + 50) / 3.0).toFloat
    f(7) shouldBe 15f
  }

  test("decodeImageFeatures rejects non-image payloads (stub fallback)") {
    Multimodal.decodeImageFeatures("just some text".getBytes("UTF-8")) shouldBe None
    // extractFeatures on text payloads typed "image" must equal the stub
    val feats = Multimodal.extractFeatures(spark, Multimodal.attachMedia(docs))
      .filter(_.media_type == "image").collect()
    val expected = Multimodal.stubDecode(("abcdefgh" * 8).getBytes("UTF-8"))
    feats.head.features.toSeq shouldBe expected.toSeq
  }

  test("extractFeatures really decodes synthetic BMP images") {
    val media = Multimodal.attachSyntheticImages(spark, docs)
    val f = Multimodal.extractFeatures(spark, media)
      .collect().sortBy(_.doc_id)
    // doc 2: w = 2%13+1 = 3, h = 2%7+1 = 3, color (2, 14, 26)
    val d2 = f(2).features
    d2(0) shouldBe 3f; d2(1) shouldBe 3f; d2(2) shouldBe 3f
    d2(3) shouldBe 2f; d2(4) shouldBe 14f; d2(5) shouldBe 26f
  }

  test("decodeResizeFeatures: exact nearest-neighbor band counts on a quadrant image") {
    // 6x4 source, quadrants split at 3/2: resize to 4x5. Floor mapping:
    // srcX for x'=0..3 over w=6: 0,1,3,4 -> left band (x<3): 2 of 4.
    // srcY for y'=0..4 over h=4: 0,0,1,2,3 -> top band (y<2): 3 of 5.
    val bytes = Multimodal.encodeBmpQuad(6, 4, 3, 2,
      tl = (100, 0, 0), tr = (200, 0, 0), bl = (10, 0, 0), br = (20, 0, 0))
    val f = Multimodal.decodeResizeFeatures(bytes, 4, 5).get
    f(0) shouldBe 4f; f(1) shouldBe 5f; f(7) shouldBe 20f
    // mean_r = (3*2*100 + 3*2*200 + 2*2*10 + 2*2*20) / 20
    f(3) shouldBe ((3 * 2 * 100 + 3 * 2 * 200 + 2 * 2 * 10 + 2 * 2 * 20) / 20.0).toFloat
    // upscale of a 1x1 image: every output pixel is the single source
    val one = Multimodal.encodeBmp(1, 1, 7, 8, 9)
    val fu = Multimodal.decodeResizeFeatures(one, 4, 5).get
    fu(3) shouldBe 7f; fu(4) shouldBe 8f; fu(5) shouldBe 9f
    Multimodal.decodeResizeFeatures("not an image".getBytes("UTF-8"), 4, 5) shouldBe None
  }

  test("resizeImage round-trips through the decoder with resized dims and stats") {
    val bytes = Multimodal.encodeBmpQuad(6, 4, 3, 2,
      tl = (100, 0, 0), tr = (200, 0, 0), bl = (10, 0, 0), br = (20, 0, 0))
    val resized = Multimodal.resizeImage(bytes, 4, 5).get
    val f = Multimodal.decodeImageFeatures(resized).get
    val expect = Multimodal.decodeResizeFeatures(bytes, 4, 5).get
    f.toSeq shouldBe expect.toSeq
  }

  test("decodeImageFeatures handles PNG payloads too (second ImageIO codec)") {
    // encode a 4x2 solid color as PNG through the same ImageIO stack the
    // decoder uses — proves the decode path is format-agnostic, not
    // BMP-fixture-shaped
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(x => (0 until 2).foreach(y =>
      img.setRGB(x, y, new java.awt.Color(10, 20, 30).getRGB)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val f = Multimodal.decodeImageFeatures(baos.toByteArray).get
    f(0) shouldBe 4f; f(1) shouldBe 2f
    f(3) shouldBe 10f; f(4) shouldBe 20f; f(5) shouldBe 30f
  }

  test("encodeWav -> decodeAudioFeatures roundtrips exact stats") {
    val bytes = Multimodal.encodeWav(11, 16000, 3000) // odd count: sum = +amp
    bytes.take(4).map(_.toChar).mkString shouldBe "RIFF" // real WAV header
    val f = Multimodal.decodeAudioFeatures(bytes).get
    f(0) shouldBe 16000f; f(1) shouldBe 1f; f(2) shouldBe 16f
    f(3) shouldBe 11f // frames
    f(4) shouldBe 3000f; f(5) shouldBe -3000f
    f(6) shouldBe 3000f // square wave, odd sample count
    f(7) shouldBe 2f // 16-bit mono frame
    val even = Multimodal.decodeAudioFeatures(Multimodal.encodeWav(10, 8000, 500)).get
    even(6) shouldBe 0f // even sample count cancels
  }

  test("decodeAudioFeatures rejects non-audio payloads (stub fallback)") {
    Multimodal.decodeAudioFeatures("just some text".getBytes("UTF-8")) shouldBe None
    // extractFeatures on text payloads typed "audio" must equal the stub
    val feats = Multimodal.extractFeatures(spark, Multimodal.attachMedia(docs))
      .filter(_.media_type == "audio").collect()
    val expected = Multimodal.stubDecode("xy".getBytes("UTF-8"))
    feats.head.features.toSeq shouldBe expected.toSeq
  }

  test("extractFeatures really decodes synthetic WAV audio") {
    val media = Multimodal.attachSyntheticAudio(spark, docs)
    val f = Multimodal.extractFeatures(spark, media)
      .collect().sortBy(_.doc_id)
    // doc 2: n = 2%50+10 = 12, rate = 8000*(2%4+1) = 24000, amp = 3*30 = 90
    val d2 = f(2).features
    d2(0) shouldBe 24000f; d2(1) shouldBe 1f; d2(3) shouldBe 12f
    d2(4) shouldBe 90f; d2(5) shouldBe -90f; d2(6) shouldBe 0f
  }

  test("encodeAvi -> decodeVideoMetadata roundtrips exact header fields") {
    val bytes = Multimodal.encodeAvi(320, 240, 7, 33333, 100)
    bytes.take(4).map(_.toChar).mkString shouldBe "RIFF"
    new String(bytes, 8, 4) shouldBe "AVI "
    val f = Multimodal.decodeVideoMetadata(bytes).get
    f(0) shouldBe 320f; f(1) shouldBe 240f // width, height
    f(2) shouldBe 7f // total frames
    f(3) shouldBe 33333f // usec per frame
    f(4) shouldBe 1f // streams
    f(5) shouldBe (320 * 240).toFloat // max bytes/sec fixture value
    f(6) shouldBe 100f // suggested buffer = frame bytes
    f(7) shouldBe 0f // flags
    // odd frame size exercises RIFF word padding in the chunk walk
    Multimodal.decodeVideoMetadata(Multimodal.encodeAvi(16, 12, 3, 40000, 5))
      .get.apply(2) shouldBe 3f
  }

  test("decodeVideoMetadata rejects non-AVI payloads (stub fallback)") {
    Multimodal.decodeVideoMetadata("just some text".getBytes("UTF-8")) shouldBe None
    // a WAV is RIFF but not AVI — the form type check must reject it
    Multimodal.decodeVideoMetadata(Multimodal.encodeWav(11, 8000, 100)) shouldBe None
    // truncated header: RIFF/AVI magic but no parsable hdrl
    Multimodal.decodeVideoMetadata(
      Multimodal.encodeAvi(16, 12, 2, 40000, 4).take(16)) shouldBe None
    // extractFeatures on text payloads typed "video" must equal the stub
    val feats = Multimodal.extractFeatures(spark, Multimodal.attachMedia(docs))
      .filter(_.media_type == "video").collect()
    val expected = Multimodal.stubDecode("0123456789abcdef".getBytes("UTF-8"))
    feats.head.features.toSeq shouldBe expected.toSeq
  }

  test("external videoDecoder hook: consulted after the AVI walk, before the stub") {
    // fake codec: recognizes a magic prefix, else declines
    val fake: Array[Byte] => Option[Array[Float]] = bytes =>
      if (bytes.length >= 4 && bytes(0) == 'F' && bytes(1) == 'A' &&
          bytes(2) == 'K' && bytes(3) == 'E')
        Some(Array.fill(8)(42f))
      else None
    // doc 2 is video-typed with a text payload (not AVI): the hook
    // recognizes it -> hook features, not stub
    val hooked = docs.withColumn("text",
      when(col("doc_id") === 2, lit("FAKEstream")).otherwise(col("text")))
    val viaHook = Multimodal.extractFeatures(spark,
        Multimodal.attachMedia(hooked), videoDecoder = Some(fake))
      .filter(_.media_type == "video").collect().head
    viaHook.features.toSeq shouldBe Seq.fill(8)(42f)
    // hook declines (no magic) -> stub fallback, unchanged behavior
    val declined = Multimodal.extractFeatures(spark,
        Multimodal.attachMedia(docs), videoDecoder = Some(fake))
      .filter(_.media_type == "video").collect().head
    declined.features.toSeq shouldBe
      Multimodal.stubDecode("0123456789abcdef".getBytes("UTF-8")).toSeq
    // decodable AVI: the built-in walk wins — the hook is never reached
    val avi = Multimodal.attachSyntheticVideos(spark, docs)
    val poison: Array[Byte] => Option[Array[Float]] =
      _ => Some(Array.fill(8)(-1f))
    val real = Multimodal.extractFeatures(spark, avi,
        videoDecoder = Some(poison))
      .collect().sortBy(_.doc_id)
    real(1).features(0) shouldBe 17f // from the container header, not -1
  }

  test("resizeFeatures honors the n_frames contract (max(1, n_bytes/64))") {
    val media = Multimodal.attachMedia(docs)
    val f = Multimodal.resizeFeatures(spark, media, outW = 4, outH = 5)
      .collect().sortBy(_.doc_id)
    f.map(_.n_frames).toSeq shouldBe Seq(1, 1, 1) // 64/64, 2/64->1, 16/64->1
    val big = Seq((9L, "abcdefgh" * 32)).toDF("doc_id", "text") // 256 bytes
    val fb = Multimodal.resizeFeatures(spark,
      Multimodal.attachMedia(big), outW = 4, outH = 5).collect().head
    fb.n_frames shouldBe 4
  }

  test("extractFeatures really parses synthetic AVI containers") {
    val media = Multimodal.attachSyntheticVideos(spark, docs)
    val f = Multimodal.extractFeatures(spark, media)
      .collect().sortBy(_.doc_id)
    // doc 1: w = 1%64+16 = 17, h = 1%48+12 = 13, frames = 1%8+2 = 3
    val d1 = f(1).features
    d1(0) shouldBe 17f; d1(1) shouldBe 13f; d1(2) shouldBe 3f
    d1(3) shouldBe 34000f // 33000 + (1%5)*1000
  }

  test("decodeVideoMetadata bounds crafted chunk sizes (no infinite walk)") {
    // hdrl containing a junk chunk whose u32 size truncates to -8 as an
    // Int: an unbounded walk would advance the cursor by ZERO bytes and
    // hang the task forever (no exception for the NonFatal catch)
    val bb = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = (0 until 4).foreach(i => bb.write(((v >> (8 * i)) & 0xff).toInt))
    def cc(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
    cc("RIFF"); u32(24); cc("AVI ")
    cc("LIST"); u32(12); cc("hdrl")
    cc("JUNK"); u32(0xFFFFFFF8L)
    Multimodal.decodeVideoMetadata(bb.toByteArray) shouldBe None
  }

  test("aviFrames extracts real movi chunk payloads in order") {
    val bytes = Multimodal.encodeAvi(16, 12, 3, 40000, 5) // odd size: padding
    val frames = Multimodal.aviFrames(bytes).get
    frames.length shouldBe 3
    all(frames.map(_.length)) shouldBe 5
    // payload content is the deterministic fixture pattern
    frames(2).map(_ & 0xff).toSeq shouldBe (0 until 5).map(j => (2 * 31 + j) % 256)
    // non-AVI payloads: no frames (fallback tier decides)
    Multimodal.aviFrames("plain text".getBytes("UTF-8")) shouldBe None
    Multimodal.aviFrames(Multimodal.encodeWav(11, 8000, 100)) shouldBe None
    // extractContainerFrames: rows only for decodable containers
    val media = Multimodal.attachSyntheticVideos(spark,
      Seq((9L, "x")).toDF("doc_id", "text"))
    val rows = Multimodal.extractContainerFrames(spark, media)
      .collect().sortBy(_.frame_idx)
    rows.length shouldBe (9 % 8 + 2).toInt
    all(rows.map(_.frame_bytes)) shouldBe (9 % 32 + 4).toInt
    rows(0).byte_sum shouldBe (0 until 13).map(j => j % 256).sum.toLong
  }

  test("encodeAviDib -> decodeVideoFrameFeatures roundtrips exact pixel stats") {
    // width 5: stride 16 vs 15 raw bytes — exercises the 4-byte row pad
    val bytes = Multimodal.encodeAviDib(5, 3, 2, colorSeed = 7L)
    val frames = Multimodal.decodeVideoFrameFeatures(bytes).get
    frames.length shouldBe 2
    val f0 = frames(0)
    f0(0) shouldBe 5f; f0(1) shouldBe 3f
    f0(2) shouldBe ((7L + 0) % 256).toFloat          // mean_r
    f0(3) shouldBe ((7L * 7) % 256).toFloat          // mean_g
    f0(4) shouldBe ((13L * 7) % 256).toFloat         // mean_b
    f0(6) shouldBe 15f                               // n_pixels
    f0(7) shouldBe 0f                                // codec tag: DIB
    val f1 = frames(1)
    f1(2) shouldBe ((7L + 11) % 256).toFloat
    // the container also parses through the metadata walk
    Multimodal.decodeVideoMetadata(bytes).get(0) shouldBe 5f
  }

  test("DIB decode is row-order invariant (top-down biHeight accepted)") {
    val bytes = Multimodal.encodeAviDib(4, 2, 1, colorSeed = 3L)
    // flip biHeight to negative (top-down): locate strf body and patch.
    // strf body starts right after the 'strf'+size header inside strl.
    val idx = {
      var i = 0; var at = -1
      while (at < 0 && i < bytes.length - 4) {
        if (bytes(i) == 's' && bytes(i + 1) == 't' && bytes(i + 2) == 'r' &&
            bytes(i + 3) == 'f') at = i
        i += 1
      }
      at + 8
    }
    val h = 2
    val neg = -h
    bytes(idx + 8) = (neg & 0xff).toByte
    bytes(idx + 9) = ((neg >> 8) & 0xff).toByte
    bytes(idx + 10) = ((neg >> 16) & 0xff).toByte
    bytes(idx + 11) = ((neg >> 24) & 0xff).toByte
    val frames = Multimodal.decodeVideoFrameFeatures(bytes).get
    frames(0)(1) shouldBe 2f // |biHeight|
    frames(0)(2) shouldBe 3f // solid color: stats unchanged by row order
  }

  test("MJPEG frames route through the ImageIO tier") {
    // build an AVI whose '00dc' frames are complete JPEGs (solid gray)
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(128, 128, 128))
    g2.fillRect(0, 0, 8, 6); g2.dispose()
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val jpeg = jb.toByteArray
    jpeg.take(2).map(_ & 0xff).toSeq shouldBe Seq(0xff, 0xd8)
    val bb = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => bb.write(((v >> (8 * i)) & 0xff).toInt))
    def cc(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
    val jpad = jpeg.length + (jpeg.length & 1)
    val hdrlSize = 4 + 8 + 56
    val moviSize = 4 + 2 * (8 + jpad)
    cc("RIFF"); u32(4 + (8 + hdrlSize) + (8 + moviSize)); cc("AVI ")
    cc("LIST"); u32(hdrlSize); cc("hdrl")
    cc("avih"); u32(56)
    u32(33367); u32(0); u32(0); u32(0); u32(2); u32(0); u32(1); u32(0)
    u32(8); u32(6); u32(0); u32(0); u32(0); u32(0)
    cc("LIST"); u32(moviSize); cc("movi")
    (0 until 2).foreach { _ =>
      cc("00dc"); u32(jpeg.length); bb.write(jpeg)
      if ((jpeg.length & 1) == 1) bb.write(0)
    }
    val frames = Multimodal.decodeVideoFrameFeatures(bb.toByteArray).get
    frames.length shouldBe 2
    frames(0)(0) shouldBe 8f; frames(0)(1) shouldBe 6f
    frames(0)(7) shouldBe 1f // codec tag: JPEG
    // JPEG is lossy but a solid mid-gray block decodes within 2 levels
    frames(0)(2) shouldBe 128f +- 2f
    frames(0)(6) shouldBe 48f
  }

  test("frame-content decoder skips audio chunks and undecodable codecs") {
    // interleave a '01wb' audio chunk among DIB frames: the video walk
    // must not feed it to the pixel decoder (aviFrames still sees it)
    val base = Multimodal.encodeAviDib(4, 2, 1, colorSeed = 5L)
    val bb = new java.io.ByteArrayOutputStream()
    bb.write(base)
    // append a second movi LIST holding one audio chunk sized exactly
    // like a DIB raster (stride 12 x h 2) — size alone must not route it
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => bb.write(((v >> (8 * i)) & 0xff).toInt))
    def cc(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
    val audio = Array.fill(24)(0xee.toByte)
    cc("LIST"); u32(4 + 8 + audio.length); cc("movi")
    cc("01wb"); u32(audio.length); bb.write(audio)
    val out = bb.toByteArray
    Multimodal.aviVideoFrames(out).get.length shouldBe 1
    Multimodal.aviFrames(out).get.length shouldBe 2
    // frame stats come from the DIB frame only
    val feats = Multimodal.decodeVideoFrameFeatures(out).get
    feats.length shouldBe 1
    feats(0)(2) shouldBe 5f
    // non-AVI and truncated payloads: None, never a throw
    Multimodal.decodeVideoFrameFeatures("junk".getBytes("UTF-8")) shouldBe None
    Multimodal.decodeVideoFrameFeatures(out.take(30)) shouldBe None
    // a '00dc' payload that is neither DIB-sized nor JPEG yields no rows
    val stub = Multimodal.encodeAvi(16, 12, 2, 40000, 5)
    Multimodal.decodeVideoFrameFeatures(stub) shouldBe None
  }

  test("decodeVideoFrames: one stats row per frame, gate fixture shape") {
    val media = Multimodal.attachSyntheticDibVideos(spark,
      Seq((9L, "x"), (10L, "y")).toDF("doc_id", "text"))
    val rows = Multimodal.decodeVideoFrames(spark, media).collect()
      .groupBy(_.doc_id)
    rows(9L).length shouldBe (9 % 5 + 1)
    rows(10L).length shouldBe (10 % 5 + 1)
    val r0 = rows(9L).minBy(_.frame_idx)
    r0.width shouldBe (9 % 16 + 4).toFloat
    r0.height shouldBe (9 % 12 + 3).toFloat
    r0.mean_r shouldBe (9 % 256).toFloat
    r0.mean_g shouldBe ((7 * 9) % 256).toFloat
    r0.mean_b shouldBe ((13 * 9) % 256).toFloat
    r0.n_pixels shouldBe ((9 % 16 + 4) * (9 % 12 + 3)).toFloat
  }

  test("frameSample slices payload into n frames covering all bytes") {
    val frames = Multimodal.frameSample(Multimodal.attachMedia(docs), 4)
      .filter($"doc_id" === 0)
      .orderBy("frame_idx").collect()
    frames.length shouldBe 4
    val total = frames.map(_.getAs[Array[Byte]]("frame").length).sum
    total shouldBe 64
    // tiny payload still yields at least one non-empty frame
    Multimodal.frameSample(Multimodal.attachMedia(docs), 4)
      .filter($"doc_id" === 1).count() should be >= 1L
  }

  test("audioWindowStats: exact per-window energy/crossings, tail window short") {
    val wav = Multimodal.encodeWav(37, 8000, 100)
    val wins = Multimodal.audioWindowStats(wav, window = 16).get
    // 37 samples -> windows of 16, 16, 5
    wins.map(_._2) shouldBe Vector(16, 16, 5)
    wins.map(_._1) shouldBe Vector(0, 1, 2)
    // square wave: every sample is ±100 -> energy = len * 100²
    wins.map(_._3) shouldBe Vector(160000L, 160000L, 50000L)
    // alternating signs: len-1 crossings per window — the boundary
    // pair between windows must NOT be counted (prev resets per window)
    wins.map(_._4) shouldBe Vector(15, 15, 4)
    // malformed payload -> None (stub fallback tier)
    Multimodal.audioWindowStats(Array[Byte](1, 2, 3), 16) shouldBe None
    // whole-clip window degenerates to the decodeAudioFeatures view
    val one = Multimodal.audioWindowStats(wav, window = 64).get
    one.length shouldBe 1
    one(0) shouldBe ((0, 37, 370000L, 36))
  }

  test("dhashCode: solid image hashes to zero, gradient edge sets one bit per row, feeds hammingDistance") {
    // solid color: no gradient anywhere -> all-zero words
    val solid = Multimodal.dhashCode(Multimodal.encodeBmp(16, 8, 77, 77, 77)).get
    solid shouldBe Array(0L, 0L)
    // bright-left/dark-right split at the exact cell boundary:
    // 9-wide grid on an 18-wide image puts cells 0..4 bright (srcX=2x<9)
    // and 5..8 dark -> exactly one descending pair per row at x=4
    val split = Multimodal.dhashCode(Multimodal.encodeBmpQuad(
      18, 8, 9, 8,
      tl = (200, 200, 200), tr = (10, 10, 10),
      bl = (0, 0, 0), br = (0, 0, 0))).get
    val expected = (0 until 8).map(y => y * 8 + 4) // bit y*8+4 per row
    def bitsOf(wd: Array[Long]): Set[Int] =
      (0 until 64).filter(b => (wd(b / 32) >> (b % 32) & 1L) == 1L).toSet
    bitsOf(split) shouldBe expected.toSet
    // codes compose with the Hamming machinery: distance solid->split
    // is exactly the 8 set bits; identical codes are 0 apart
    import org.apache.spark.sql.functions.col
    val df = Seq((solid, split), (split, split)).toDF("a", "b")
    df.select(graft.ops.Similarity.hammingDistance(col("a"), col("b")))
      .as[Long].collect() shouldBe Array(8L, 0L)
    // undecodable payload -> None (the extractFeatures contract)
    Multimodal.dhashCode(Array[Byte](9, 9, 9)) shouldBe None
  }

  test("audioFingerprint: descending-energy boundaries set bits, amplitude cancels") {
    // 37 samples, window 16 -> windows of 16,16,5: energies tie at the
    // first boundary, drop at the tail -> only bit 1 set
    val wav = Multimodal.encodeWav(37, 8000, 100)
    Multimodal.audioFingerprint(wav, window = 16).get shouldBe Array(2L, 0L)
    // amplitude scaling preserves every delta sign -> identical code
    val loud = Multimodal.encodeWav(37, 8000, 3000)
    Multimodal.audioFingerprint(loud, window = 16).get shouldBe Array(2L, 0L)
    // exact multiple of the window: no tail, no descending pair
    Multimodal.audioFingerprint(Multimodal.encodeWav(32, 8000, 100),
      window = 16).get shouldBe Array(0L, 0L)
    // malformed payload -> None
    Multimodal.audioFingerprint(Array[Byte](1, 2, 3)) shouldBe None
  }

  test("sceneCuts: flags intensity jumps between consecutive frames only") {
    import org.apache.spark.sql.functions.col
    // two videos: doc 1 has a cut at frame 2, doc 2 is static
    val frames = Seq(
      (1L, 0, 30f, 30f, 40f), (1L, 1, 30f, 30f, 40f), (1L, 2, 90f, 90f, 90f),
      (2L, 0, 10f, 10f, 10f), (2L, 1, 10f, 10f, 10f))
      .toDF("doc_id", "frame_idx", "mean_r", "mean_g", "mean_b")
    val cuts = Multimodal.sceneCuts(frames, threshold = 60.0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getFloat(2),
        r.getBoolean(3))).toSet
    // frame 0 rows never emit (no predecessor); delta 1->2 = 170
    cuts shouldBe Set((1L, 1, 0f, false), (1L, 2, 170f, true),
      (2L, 1, 0f, false))
  }

  test("videoFrameNearDupPairs: bucket-join candidates, exact-distance verify") {
    import org.apache.spark.sql.functions.col
    // bucket 64, maxDist 48. doc 1 frame0 ~ doc 2 frame0 (dist 10,
    // same cube cell); doc 1 frame1 and doc 3 frame0 share a cell but
    // distance 60 > 48 -> dropped; doc 4 is 8 away from doc 1 frame0
    // but straddles the 64-boundary (60 vs 68) -> missed, the grid-LSH
    // trade; doc 5 has different dims -> never a candidate
    val frames = Seq(
      (1L, 0, 8f, 6f, 10f, 20f, 30f),
      (1L, 1, 8f, 6f, 130f, 130f, 130f),
      (2L, 0, 8f, 6f, 20f, 25f, 35f),
      (3L, 0, 8f, 6f, 190f, 130f, 130f),
      (4L, 0, 8f, 6f, 10f, 20f, 68f),
      (5L, 0, 4f, 3f, 10f, 20f, 30f))
      .toDF("doc_id", "frame_idx", "width", "height",
        "mean_r", "mean_g", "mean_b")
    val got = Multimodal.videoFrameNearDupPairs(frames)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    got shouldBe Set((1L, 2L, 1L, 10))
    // same-video frames never pair with themselves; a second shared
    // frame raises the pair count and min_dist takes the closest
    val frames2 = frames.unionByName(Seq(
        (2L, 1, 8f, 6f, 9f, 21f, 31f)) // dist 1 from doc1 frame0
      .toDF("doc_id", "frame_idx", "width", "height",
        "mean_r", "mean_g", "mean_b"))
    val got2 = Multimodal.videoFrameNearDupPairs(frames2)
      .filter(col("doc_a") === 1 && col("doc_b") === 2)
      .collect().map(r => (r.getLong(2), r.getInt(3)))
    got2 shouldBe Array((2L, 1))
  }
}
