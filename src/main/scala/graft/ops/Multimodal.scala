package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus partition-wise decode /
  * feature-extract / frame-sample operators.
  *
  * The decode tier:
  *  - IMAGES decode for real: `javax.imageio` reads BMP/PNG pure-JVM
  *    (no native libs), so [[decodeImageFeatures]] is a production
  *    decoder for those formats and [[extractFeatures]] uses it for
  *    `image`-typed rows, falling back to the stub when the payload
  *    isn't a decodable image.
  *  - AUDIO decodes for real too: `javax.sound.sampled` reads WAV/PCM
  *    pure-JVM, so [[decodeAudioFeatures]] is a production decoder for
  *    RIFF/WAVE payloads and [[extractFeatures]] uses it for
  *    `audio`-typed rows, falling back to the stub when the payload
  *    isn't decodable audio.
  *  - VIDEO: container METADATA decodes for real — AVI is a RIFF
  *    container whose header (dimensions, frame count, frame rate,
  *    stream count) parses pure-JVM ([[decodeVideoMetadata]]) — and so
  *    does frame CONTENT for the two codecs a JVM decodes natively:
  *    uncompressed BI_RGB DIB rasters and MJPEG (each frame a JPEG,
  *    routed through the same ImageIO tier as still images), via
  *    [[decodeVideoFrameFeatures]]. Only natively-coded formats
  *    (H.264 etc.) route through the `videoDecoder` plug point of
  *    [[extractFeatures]] when one is supplied, and fall back to
  *    [[stubDecode]] otherwise — so linking a real codec changes one
  *    argument, never the operator. The mapPartitions shape (decoder
  *    state reused across a partition's rows, no per-row init) is the
  *    pattern all codecs need.
  */
object Multimodal {

  // one-time global: ImageIO's default decode path writes a temp CACHE
  // FILE per read — per-row disk IO an executor must never pay
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(doc_id: Long, media: Array[Byte],
                            media_type: String, n_bytes: Int)
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_frames: Int, features: Array[Float])

  /** Wrap a text table into a media table: payload = utf-8 bytes as an
    * opaque binary column + typed metadata. In production the binary
    * comes from the storage layer (e.g. image bytes inlined in parquet).
    */
  def attachMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      octet_length(encode(col("text"), "utf-8")).as("n_bytes"))

  /** STUB decoder: deterministic fake "decode" of a media payload into
    * an 8-dim feature vector (bucketed byte means). Replace with a real
    * codec (libjpeg / ffmpeg / soundfile) in production — signature and
    * batching stay identical.
    */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val dims = 8
    val sums = new Array[Long](dims)
    val counts = new Array[Long](dims)
    var i = 0
    while (i < bytes.length) {
      val d = i % dims
      sums(d) += bytes(i) & 0xff
      counts(d) += 1
      i += 1
    }
    Array.tabulate(dims)(d =>
      if (counts(d) == 0) 0f else (sums(d).toDouble / counts(d)).toFloat)
  }

  /** Pixel-count ceiling for the decoder (256 megapixels ≈ 1 GiB of
    * ARGB ints): a header claiming absurd-but-parseable dimensions must
    * fall back to the stub tier, not drive an unbounded allocation on
    * an executor.
    */
  val MaxDecodePixels: Long = 256L * 1024 * 1024

  /** REAL image decode (BMP/PNG via `javax.imageio`, pure JVM) into the
    * fixed 8-dim feature layout:
    * `[width, height, channels, mean_r, mean_g, mean_b, mean_gray,
    * n_pixels]`. Returns None when the payload is not a decodable
    * image, so callers fall back to the stub tier. Catches NonFatal,
    * not just IOException: on web-scale data malformed headers make
    * ImageIO throw IllegalArgument/NegativeArraySize/IndexOutOfBounds
    * too, and ONE bad row must not fail the task (and with it, after
    * retries, a 100 TB job). Pixels are read a ROW at a time via the
    * bulk getRGB overload — the per-pixel getRGB path pays virtual
    * dispatch + color conversion per pixel, 10-100× slower on real
    * photos for identical statistics.
    */
  def decodeImageFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    readImageGuarded(bytes).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val ch = img.getColorModel.getNumComponents
      var sr = 0L; var sg = 0L; var sb = 0L
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Array(w.toFloat, h.toFloat, ch.toFloat,
        (sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat,
        (sb.toDouble / n).toFloat,
        ((sr + sg + sb).toDouble / (3.0 * n)).toFloat, n.toFloat)
    }

  /** Guarded ImageIO read shared by the image tiers: dimensions come
    * from the HEADER (ImageReader.getWidth/getHeight parse metadata
    * only) BEFORE read() allocates the raster — a malformed header
    * claiming 40000x40000 must be rejected without first paying its
    * multi-GB allocation (OutOfMemoryError is fatal; it would escape
    * the NonFatal catch and kill the task). Resources close in finally
    * on EVERY path — a malformed header that makes getWidth/read throw
    * must not leak the input stream (with ImageIO's file cache it
    * would be a temp file + fd per row). Catches NonFatal: one bad row
    * must not fail a 100 TB task.
    */
  private[ops] def readImageGuarded(bytes: Array[Byte])
      : Option[java.awt.image.BufferedImage] = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val w = reader.getWidth(0); val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) None
            else Some(reader.read(0))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode a solid-color BMP (the fixture generator for the real-decode
    * gate: constant pixels make every decoded statistic a closed-form
    * function of (w, h, r, g, b), so an external engine can oracle the
    * decode without a decoder of its own).
    */
  def encodeBmp(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad image dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgb = (r & 0xff) << 16 | (g & 0xff) << 8 | (b & 0xff)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    baos.toByteArray
  }

  /** Synthetic REAL-image corpus: one solid-color BMP per document with
    * dimensions/color derived from doc_id — actual encoded bytes the
    * decoder must parse, with closed-form decoded stats.
    */
  def attachSyntheticImages(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val bytes = encodeBmp((id % 13 + 1).toInt, (id % 7 + 1).toInt,
          (id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt)
        MediaRow(id, bytes, "image", bytes.length)
      }
    }.toDF()
  }

  /** Nearest-neighbor resize stats: decode (same guard as
    * [[decodeImageFeatures]]), resample to `outW`×`outH` with the
    * integer mapping srcY = ⌊y·h/outH⌋, srcX = ⌊x·w/outW⌋ (floor
    * convention — deterministic and replayable by integer arithmetic in
    * any engine), and return the RESIZED image's stats in the fixed
    * 8-dim layout `[width, height, channels, mean_r, mean_g, mean_b,
    * mean_gray, n_pixels]`. Never materializes the resized raster:
    * source rows are read once per OUTPUT row via the bulk getRGB
    * overload and sampled in place — the per-row cost is O(w + outW),
    * and memory is one int row regardless of target size.
    */
  def decodeResizeFeatures(bytes: Array[Byte], outW: Int,
                           outH: Int): Option[Array[Float]] = {
    require(outW > 0 && outH > 0, s"bad resize dims ${outW}x$outH")
    try {
      readImageGuarded(bytes).map { img =>
        val w = img.getWidth; val h = img.getHeight
        val ch = img.getColorModel.getNumComponents
        var sr = 0L; var sg = 0L; var sb = 0L
        val row = new Array[Int](w)
        var y = 0
        while (y < outH) {
          val sy = (y.toLong * h / outH).toInt
          img.getRGB(0, sy, w, 1, row, 0, w)
          var x = 0
          while (x < outW) {
            val rgb = row((x.toLong * w / outW).toInt)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = outW.toLong * outH
        Array(outW.toFloat, outH.toFloat, ch.toFloat,
          (sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat,
          (sb.toDouble / n).toFloat,
          ((sr + sg + sb).toDouble / (3.0 * n)).toFloat, n.toFloat)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Difference-hash (dHash) of an image — the standard perceptual
    * fingerprint for IMAGE near-dup detection (the visual sibling of
    * the text tier's SimHash): nearest-neighbor downsample to
    * (hashW+1)×hashH (same floor mapping as [[decodeResizeFeatures]]),
    * grayscale as the exact integer r+g+b sum (no division — keeps
    * every comparison integer-exact and engine-replayable), one bit
    * per cell pair: gray(x,y) > gray(x+1,y). Bits pack 32 per long
    * word — [[Similarity.signWords]]'s convention — so the codes feed
    * straight into [[Similarity.hammingDistance]]/LSH banding for
    * corpus-scale image dedup: resized crops, re-encodes, and small
    * color shifts keep small Hamming distance while exact-hash dedup
    * (d01) sees different bytes. None when the payload is not a
    * decodable image (callers filter or fall back, the
    * [[extractFeatures]] contract).
    */
  def dhashCode(bytes: Array[Byte], hashW: Int = 8,
                hashH: Int = 8): Option[Array[Long]] = {
    require(hashW > 0 && hashH > 0, s"bad hash dims ${hashW}x$hashH")
    try {
      readImageGuarded(bytes).map { img =>
        val w = img.getWidth; val h = img.getHeight
        val gw = hashW + 1
        val gs = Array.ofDim[Int](hashH, gw)
        val row = new Array[Int](w)
        var y = 0
        while (y < hashH) {
          val sy = (y.toLong * h / hashH).toInt
          img.getRGB(0, sy, w, 1, row, 0, w)
          var x = 0
          while (x < gw) {
            val rgb = row((x.toLong * w / gw).toInt)
            gs(y)(x) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val words = new Array[Long]((hashW * hashH + 31) / 32)
        var bit = 0
        y = 0
        while (y < hashH) {
          var x = 0
          while (x < hashW) {
            if (gs(y)(x) > gs(y)(x + 1))
              words(bit / 32) |= (1L << (bit % 32))
            bit += 1
            x += 1
          }
          y += 1
        }
        words
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-row [[dhashCode]] over a media table — the image-dedup
    * signature pass: one partition-wise decode sweep (decoder state
    * per task, the codec-tier mapPartitions contract), emitting
    * (doc_id, dhash array<long>) with NULL for undecodable payloads.
    * Downstream is pure relational: band the words for LSH buckets or
    * rank by [[Similarity.hammingDistance]] within buckets.
    */
  def imageDHash(spark: SparkSession, media: DataFrame, hashW: Int = 8,
                 hashH: Int = 8): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media", "media_type", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.map(r => (r.doc_id, dhashCode(r.media, hashW, hashH)))
      }.toDF("doc_id", "dhash")
  }

  /** Nearest-neighbor resize to re-encoded BMP bytes (the pipeline
    * form — thumbnail/model-input generation feeding further media
    * stages). Same mapping as [[decodeResizeFeatures]]; spec-pinned to
    * round-trip through the decoder with the expected dims and stats.
    */
  def resizeImage(bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    require(outW > 0 && outH > 0, s"bad resize dims ${outW}x$outH")
    try {
      readImageGuarded(bytes).map { img =>
        val w = img.getWidth; val h = img.getHeight
        val out = new java.awt.image.BufferedImage(outW, outH,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val row = new Array[Int](w)
        var y = 0
        while (y < outH) {
          val sy = (y.toLong * h / outH).toInt
          img.getRGB(0, sy, w, 1, row, 0, w)
          var x = 0
          while (x < outW) {
            out.setRGB(x, y, row((x.toLong * w / outW).toInt))
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "bmp", baos)
        baos.toByteArray
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Dataset-level resize: the codec-tier shape (mapPartitions, one
    * decoder session per partition, pipelined with the scan — no
    * shuffle). Non-image payloads fall back to the stub tier, same
    * contract as [[extractFeatures]].
    */
  def resizeFeatures(spark: SparkSession, media: DataFrame, outW: Int,
                     outH: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media", "media_type", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val feats = decodeResizeFeatures(r.media, outW, outH)
            .getOrElse(stubDecode(r.media))
          MediaFeatures(r.doc_id, r.media_type,
            n_frames = math.max(1, r.n_bytes / 64), features = feats)
        }
      }
  }

  /** Encode a QUADRANT-color BMP: columns [0, leftCols) × rows
    * [0, topRows) get `tl`, and so on — the resize-gate fixture. Four
    * constant quadrants make every resized statistic a closed-form
    * function of how many output rows/columns the nearest-neighbor
    * mapping lands in each band, which is exactly the property a
    * resampler can get wrong (off-by-one, swapped axes, wrong
    * rounding) — a solid color would hide all of it.
    */
  def encodeBmpQuad(width: Int, height: Int, leftCols: Int, topRows: Int,
                    tl: (Int, Int, Int), tr: (Int, Int, Int),
                    bl: (Int, Int, Int), br: (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad image dims ${width}x$height")
    def pack(c: (Int, Int, Int)): Int =
      (c._1 & 0xff) << 16 | (c._2 & 0xff) << 8 | (c._3 & 0xff)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val c = if (y < topRows) { if (x < leftCols) tl else tr }
                else { if (x < leftCols) bl else br }
        img.setRGB(x, y, pack(c))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    baos.toByteArray
  }

  /** Synthetic quadrant-image corpus for the resize gate: dimensions
    * id-derived (w = id%13+1, h = id%7+1), quadrant split at w/2, h/2,
    * four id-derived colors — closed-form resized stats via the two
    * band-count functions the oracle recomputes.
    */
  def attachSyntheticQuadImages(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (id % 13 + 1).toInt; val h = (id % 7 + 1).toInt
        val bytes = encodeBmpQuad(w, h, w / 2, h / 2,
          tl = ((id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt),
          tr = ((id * 3 % 256).toInt, (id * 11 % 256).toInt, (id * 17 % 256).toInt),
          bl = ((id * 5 % 256).toInt, (id * 19 % 256).toInt, (id * 23 % 256).toInt),
          br = ((id * 29 % 256).toInt, (id * 31 % 256).toInt, (id * 37 % 256).toInt))
        MediaRow(id, bytes, "image", bytes.length)
      }
    }.toDF()
  }

  /** Frame-count ceiling for the audio decoder (64M frames of 16-bit
    * stereo ≈ 256 MB): a header claiming absurd-but-parseable length
    * must fall back to the stub tier, same contract as
    * [[MaxDecodePixels]]. The decode itself STREAMS through a bounded
    * buffer, so the cap bounds work, not allocation.
    */
  val MaxDecodeFrames: Long = 64L * 1024 * 1024

  /** REAL audio decode (RIFF/WAVE 16-bit PCM via `javax.sound.sampled`,
    * pure JVM) into the fixed 8-dim feature layout:
    * `[sample_rate, channels, bits, n_frames, max_amp, min_amp,
    * sum_amp, frame_bytes]`. Returns None when the payload is not
    * decodable 16-bit PCM audio, so callers fall back to the stub tier.
    * Samples stream through an 8 KiB frame-aligned buffer — the decoder
    * never materializes the raster equivalent (a whole clip) in memory,
    * which is what lets one executor thread chew through hour-long
    * recordings. NonFatal-safe per row, like the image tier: one
    * malformed header must not fail a 100 TB task.
    */
  def decodeAudioFeatures(bytes: Array[Byte]): Option[Array[Float]] = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val nFrames = ais.getFrameLength
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            || fmt.getSampleSizeInBits != 16
            || nFrames <= 0 || nFrames > MaxDecodeFrames) None
        else {
          val frameBytes = fmt.getFrameSize
          val bigEndian = fmt.isBigEndian
          val buf = new Array[Byte](8192 - 8192 % math.max(frameBytes, 2))
          var sum = 0L; var mx = Int.MinValue; var mn = Int.MaxValue
          var read = ais.read(buf)
          while (read > 0) {
            var off = 0
            while (off + 1 < read) {
              val v = if (bigEndian) (buf(off) << 8) | (buf(off + 1) & 0xff)
                      else (buf(off + 1) << 8) | (buf(off) & 0xff)
              sum += v; if (v > mx) mx = v; if (v < mn) mn = v
              off += 2
            }
            read = ais.read(buf)
          }
          if (mx < mn) None // no samples despite positive frame length
          else Some(Array(fmt.getSampleRate, fmt.getChannels.toFloat, 16f,
            nFrames.toFloat, mx.toFloat, mn.toFloat, sum.toFloat,
            frameBytes.toFloat))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One row of windowed audio analysis: exact integer energy/crossing
    * skeleton for window `win` of a clip.
    */
  final case class AudioWindow(doc_id: Long, win: Int, n_samples: Int,
                               sum_sq: Long, zero_crossings: Int)

  /** Windowed PCM statistics — the per-window energy (sum of squared
    * 16-bit amplitudes) and zero-crossing count a VAD / silence-trim /
    * speech-music split cuts on, over windows of `window` samples
    * (tail window short). Streams the clip through the same 8 KiB
    * frame-aligned buffer as [[decodeAudioFeatures]]: per-window state
    * is three counters, never the clip, so hour-long recordings cost
    * O(window) memory per executor thread. A zero crossing is an
    * adjacent same-window pair with strictly negative product.
    * Integer-exact outputs → a closed-form fixture oracles the whole
    * analysis. None (→ caller falls back to the stub tier) when the
    * payload is not decodable 16-bit PCM.
    */
  def audioWindowStats(bytes: Array[Byte],
                       window: Int): Option[Vector[(Int, Int, Long, Int)]] = {
    require(window > 0, s"window must be positive, got $window")
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val nFrames = ais.getFrameLength
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            || fmt.getSampleSizeInBits != 16
            || nFrames <= 0 || nFrames > MaxDecodeFrames) None
        else {
          val frameBytes = fmt.getFrameSize
          val bigEndian = fmt.isBigEndian
          val buf = new Array[Byte](8192 - 8192 % math.max(frameBytes, 2))
          val out = Vector.newBuilder[(Int, Int, Long, Int)]
          var win = 0; var n = 0; var sumSq = 0L; var zc = 0; var prev = 0
          def flush(): Unit = {
            out += ((win, n, sumSq, zc)); win += 1; n = 0; sumSq = 0L; zc = 0
          }
          var read = ais.read(buf)
          while (read > 0) {
            var off = 0
            while (off + 1 < read) {
              val v = if (bigEndian) (buf(off) << 8) | (buf(off + 1) & 0xff)
                      else (buf(off + 1) << 8) | (buf(off) & 0xff)
              if (n > 0 && prev * v < 0) zc += 1
              sumSq += v.toLong * v; n += 1; prev = v
              if (n == window) flush()
              off += 2
            }
            read = ais.read(buf)
          }
          if (n > 0) flush()
          val res = out.result()
          if (res.isEmpty) None else Some(res)
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Dataset-level windowed audio analysis over `audio`-typed media
    * rows: one decoder per partition, one output row per (clip,
    * window). Non-audio / undecodable rows are dropped (the feature
    * tiers keep them; a window analysis has nothing to say about
    * them).
    */
  def audioWindows(spark: SparkSession, media: DataFrame,
                   window: Int): Dataset[AudioWindow] = {
    import spark.implicits._
    media.select("doc_id", "media", "media_type", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.filter(_.media_type == "audio").flatMap { r =>
          audioWindowStats(r.media, window).toSeq.flatten.map {
            case (w, n, s, z) => AudioWindow(r.doc_id, w, n, s, z)
          }
        }
      }
  }

  /** Encode a Nyquist square wave (+amp, -amp, +amp, …) as a 16-bit PCM
    * mono RIFF/WAVE clip — the fixture generator for the real-decode
    * gate: every decoded statistic is a closed-form function of
    * (nSamples, sampleRate, amp), so an external engine can oracle the
    * decode without a decoder of its own (max = amp, min = -amp,
    * sum = amp when nSamples is odd else 0).
    */
  def encodeWav(nSamples: Int, sampleRate: Int, amp: Int): Array[Byte] = {
    require(nSamples > 1 && amp > 0 && amp <= Short.MaxValue,
      s"bad wav fixture params n=$nSamples amp=$amp")
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // signed PCM, little-endian
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = if (i % 2 == 0) amp else -amp
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    finally ais.close()
    baos.toByteArray
  }

  /** Perceptual AUDIO fingerprint — the 1-D sibling of [[dhashCode]]
    * (chromaprint's skeleton without the chroma transform, which needs
    * an FFT this tier deliberately does not fake): one bit per
    * adjacent window pair, set when energy DROPS across the boundary
    * (energy(w) > energy(w+1) over [[audioWindowStats]]'s exact
    * integer energies), packed 32 bits per long word
    * ([[graft.ops.Similarity.signWords]] convention) so fingerprints
    * feed [[graft.ops.Similarity.hammingDistance]]/banded pairs for
    * corpus-scale audio dedup: re-encodes and amplitude scaling
    * preserve the delta SIGNS while exact-hash dedup sees different
    * bytes. None for undecodable payloads.
    */
  def audioFingerprint(bytes: Array[Byte], window: Int = 8,
                       maxBits: Int = 64): Option[Array[Long]] = {
    require(maxBits > 0 && maxBits % 32 == 0,
      s"maxBits must be a positive multiple of 32, got $maxBits")
    audioWindowStats(bytes, window).map { wins =>
      val words = new Array[Long](maxBits / 32)
      var i = 0
      while (i < wins.length - 1 && i < maxBits) {
        if (wins(i)._3 > wins(i + 1)._3) words(i / 32) |= (1L << (i % 32))
        i += 1
      }
      words
    }
  }

  /** Per-row [[audioFingerprint]] over a media table — the audio-dedup
    * signature pass, same contract as [[imageDHash]]: one
    * partition-wise decode sweep, (doc_id, afp array<long>), NULL for
    * undecodable payloads.
    */
  def audioHash(spark: SparkSession, media: DataFrame, window: Int = 8,
                maxBits: Int = 64): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media", "media_type", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.map(r => (r.doc_id, audioFingerprint(r.media, window, maxBits)))
      }.toDF("doc_id", "afp")
  }

  /** Synthetic REAL-audio corpus: one square-wave WAV per document with
    * length/rate/amplitude derived from doc_id — actual RIFF bytes the
    * decoder must parse, with closed-form decoded stats.
    */
  def attachSyntheticAudio(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val bytes = encodeWav((id % 50 + 10).toInt,
          (8000 * (id % 4 + 1)).toInt, ((id % 1000 + 1) * 30).toInt)
        MediaRow(id, bytes, "audio", bytes.length)
      }
    }.toDF()
  }

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | (b(off + 1) & 0xffL) << 8 |
      (b(off + 2) & 0xffL) << 16 | (b(off + 3) & 0xffL) << 24

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL video-container metadata decode (AVI/RIFF, pure JVM) into the
    * fixed 8-dim feature layout:
    * `[width, height, total_frames, usec_per_frame, streams,
    * max_bytes_per_sec, suggested_buffer, flags]` — the `avih` main
    * header fields, reached by walking the RIFF chunk tree to
    * `LIST hdrl → avih`. Returns None when the payload is not an AVI
    * container, so callers fall back to the stub tier. This is the
    * production shape for video at 100 TB: metadata-level operations
    * (resolution filters, duration sums, fps histograms) never touch a
    * codec, and the chunk walk reads only the header bytes — cost is
    * independent of clip length. Frame-content decode stays with the
    * codec tier ([[stubDecode]] until one is linked).
    */
  def decodeVideoMetadata(bytes: Array[Byte]): Option[Array[Float]] = {
    try {
      if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
          fourcc(bytes, 8) != "AVI ") None
      else {
        // walk top-level chunks for LIST/hdrl, then its avih child
        var pos = 12
        var out: Option[Array[Float]] = None
        while (out.isEmpty && pos + 8 <= bytes.length) {
          val id = fourcc(bytes, pos)
          val size = u32le(bytes, pos + 4)
          if (size < 0 || pos + 8 + size > bytes.length) return None
          if (id == "LIST" && size >= 4 && fourcc(bytes, pos + 8) == "hdrl") {
            var inner = pos + 12
            val end = pos + 8 + size.toInt
            while (out.isEmpty && inner + 8 <= end) {
              val cid = fourcc(bytes, inner)
              val csize = u32le(bytes, inner + 4)
              // bound EVERY chunk size before advancing — a crafted
              // csize whose Int truncation is negative would otherwise
              // advance the cursor by zero and hang the task forever
              // (no exception for the NonFatal catch to see)
              if (csize < 0 || inner + 8 + csize > bytes.length) return None
              if (cid == "avih" && csize >= 40) {
                val o = inner + 8
                out = Some(Array(
                  u32le(bytes, o + 32).toFloat, // dwWidth
                  u32le(bytes, o + 36).toFloat, // dwHeight
                  u32le(bytes, o + 16).toFloat, // dwTotalFrames
                  u32le(bytes, o).toFloat, // dwMicroSecPerFrame
                  u32le(bytes, o + 24).toFloat, // dwStreams
                  u32le(bytes, o + 4).toFloat, // dwMaxBytesPerSec
                  u32le(bytes, o + 28).toFloat, // dwSuggestedBufferSize
                  u32le(bytes, o + 12).toFloat)) // dwFlags
              }
              inner += 8 + csize.toInt + (csize.toInt & 1)
            }
            if (out.isEmpty) return None // hdrl without avih: malformed
          }
          pos += 8 + size.toInt + (size.toInt & 1)
        }
        out
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode a minimal-but-valid AVI container (RIFF → LIST hdrl → avih,
    * then LIST movi with `frames` deterministic '00dc' chunks) — the
    * fixture generator for the video-metadata gate: every decoded
    * header field is a closed-form function of the arguments, so an
    * external engine can oracle the parse without a container library.
    */
  def encodeAvi(width: Int, height: Int, frames: Int, usecPerFrame: Int,
                frameBytes: Int): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0 && frameBytes > 0,
      s"bad avi fixture params ${width}x$height f=$frames fb=$frameBytes")
    val bb = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
    }
    def cc(s: String): Unit =
      bb.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val fbPadded = frameBytes + (frameBytes & 1)
    val hdrlSize = 4 + 8 + 56 // 'hdrl' + avih chunk header + avih body
    val moviSize = 4 + frames * (8 + fbPadded)
    cc("RIFF"); u32(4 + (8 + hdrlSize) + (8 + moviSize)); cc("AVI ")
    cc("LIST"); u32(hdrlSize); cc("hdrl")
    cc("avih"); u32(56)
    u32(usecPerFrame) // dwMicroSecPerFrame
    u32(width.toLong * height) // dwMaxBytesPerSec (closed-form fixture value)
    u32(0) // dwPaddingGranularity
    u32(0) // dwFlags
    u32(frames) // dwTotalFrames
    u32(0) // dwInitialFrames
    u32(1) // dwStreams
    u32(frameBytes) // dwSuggestedBufferSize
    u32(width); u32(height)
    u32(0); u32(0); u32(0); u32(0) // dwReserved
    cc("LIST"); u32(moviSize); cc("movi")
    var f = 0
    while (f < frames) {
      cc("00dc"); u32(frameBytes)
      var j = 0
      while (j < fbPadded) { bb.write((f * 31 + j) & 0xff); j += 1 }
      f += 1
    }
    bb.toByteArray
  }

  final case class ContainerFrame(doc_id: Long, frame_idx: Int,
                                  frame_bytes: Int, byte_sum: Long)

  /** REAL container frame extraction (AVI): walk the `movi` LIST and
    * return the frame chunk payloads in stream order ('??dc'/'??db'
    * compressed/uncompressed video, '??wb' audio) — the codec-free half
    * of video frame sampling: the container, not the codec, defines
    * frame boundaries, so a 100 TB pipeline can shard, sample, and
    * route frames without decoding one pixel. Returns None for non-AVI
    * payloads (callers fall back to [[frameSample]] byte slicing).
    */
  def aviFrames(bytes: Array[Byte]): Option[Vector[Array[Byte]]] =
    aviChunks(bytes, video = true, audio = true)

  /** [[aviFrames]] restricted to VIDEO chunks ('??dc'/'??db') — the
    * frame-content decoder must not feed interleaved audio ('??wb')
    * payloads to a pixel codec.
    */
  def aviVideoFrames(bytes: Array[Byte]): Option[Vector[Array[Byte]]] =
    aviChunks(bytes, video = true, audio = false)

  private def aviChunks(bytes: Array[Byte], video: Boolean,
                        audio: Boolean): Option[Vector[Array[Byte]]] = {
    try {
      if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
          fourcc(bytes, 8) != "AVI ") None
      else {
        val out = Vector.newBuilder[Array[Byte]]
        var sawMovi = false
        var pos = 12
        while (pos + 8 <= bytes.length) {
          val id = fourcc(bytes, pos)
          val size = u32le(bytes, pos + 4)
          if (size < 0 || pos + 8 + size > bytes.length) return None
          if (id == "LIST" && size >= 4 && fourcc(bytes, pos + 8) == "movi") {
            sawMovi = true
            var inner = pos + 12
            val end = pos + 8 + size.toInt
            while (inner + 8 <= end) {
              val cid = fourcc(bytes, inner)
              val csize = u32le(bytes, inner + 4)
              if (csize < 0 || inner + 8 + csize > bytes.length) return None
              if ((video && (cid.endsWith("dc") || cid.endsWith("db"))) ||
                  (audio && cid.endsWith("wb")))
                out += java.util.Arrays.copyOfRange(bytes, inner + 8,
                  inner + 8 + csize.toInt)
              inner += 8 + csize.toInt + (csize.toInt & 1)
            }
          }
          pos += 8 + size.toInt + (size.toInt & 1)
        }
        if (sawMovi) Some(out.result()) else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Partition-wise REAL frame extraction: one row per container frame
    * chunk with its byte count and unsigned byte sum (the stats tier a
    * frame router needs; the payload itself stays available through
    * [[aviFrames]]). Non-AVI payloads yield no rows — at scale they
    * route to the [[frameSample]] byte-slicing tier instead.
    */
  def extractContainerFrames(spark: SparkSession,
                             media: DataFrame): Dataset[ContainerFrame] = {
    import spark.implicits._
    media.select("doc_id", "media", "media_type", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          aviFrames(r.media) match {
            case Some(frames) => frames.iterator.zipWithIndex.map {
              case (f, i) =>
                var s = 0L
                var j = 0
                while (j < f.length) { s += f(j) & 0xff; j += 1 }
                ContainerFrame(r.doc_id, i, f.length, s)
            }
            case None => Iterator.empty
          }
        }
      }
  }

  /** Synthetic REAL-video corpus: one minimal AVI per document with
    * header fields derived from doc_id — actual RIFF container bytes
    * the chunk walker must parse, with closed-form decoded metadata.
    */
  def attachSyntheticVideos(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val bytes = encodeAvi((id % 64 + 16).toInt, (id % 48 + 12).toInt,
          (id % 8 + 2).toInt, (33000 + (id % 5) * 1000).toInt,
          (id % 32 + 4).toInt)
        MediaRow(id, bytes, "video", bytes.length)
      }
    }.toDF()
  }

  /** Encode a valid AVI with UNCOMPRESSED video frames (BI_RGB 24-bit
    * DIB rasters in '00db' chunks, full `strl` stream header) — the
    * fixture generator for the frame-CONTENT decode gate. Frame `f` is
    * a solid color closed-form in (`colorSeed`, f):
    * r=(seed+11f)%256, g=(7·seed+17f)%256, b=(13·seed+23f)%256, so an
    * external engine can oracle every decoded pixel statistic without a
    * video library. Rasters are bottom-up BGR with 4-byte-aligned row
    * stride — the actual on-disk layout of uncompressed AVI.
    */
  def encodeAviDib(width: Int, height: Int, frames: Int,
                   colorSeed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0,
      s"bad avi-dib fixture params ${width}x$height f=$frames")
    val bb = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
    }
    def cc(s: String): Unit =
      bb.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val stride = (width * 3 + 3) & ~3 // rows pad to 4 bytes (also even)
    val frameBytes = stride * height
    val strlSize = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf(BMIH)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + frames * (8 + frameBytes)
    cc("RIFF"); u32(4 + (8 + hdrlSize) + (8 + moviSize)); cc("AVI ")
    cc("LIST"); u32(hdrlSize); cc("hdrl")
    cc("avih"); u32(56)
    u32(33367); u32(frameBytes.toLong * 30); u32(0); u32(0)
    u32(frames); u32(0); u32(1); u32(frameBytes)
    u32(width); u32(height); u32(0); u32(0); u32(0); u32(0)
    cc("LIST"); u32(strlSize); cc("strl")
    cc("strh"); u32(56)
    cc("vids"); cc("DIB ") // fccType / fccHandler: uncompressed DIB
    u32(0); u32(0) // dwFlags, wPriority+wLanguage
    u32(0); u32(1); u32(30) // dwInitialFrames, dwScale, dwRate
    u32(0); u32(frames); u32(frameBytes) // dwStart, dwLength, dwSuggestedBuf
    u32(0xffffffffL); u32(0) // dwQuality, dwSampleSize
    u32(0); u32(0) // rcFrame (4×u16)
    cc("strf"); u32(40) // BITMAPINFOHEADER
    u32(40); u32(width); u32(height) // biSize, biWidth, biHeight (bottom-up)
    u32(1 | (24 << 16)) // biPlanes=1 | biBitCount=24
    u32(0) // biCompression = BI_RGB
    u32(frameBytes); u32(0); u32(0); u32(0); u32(0)
    cc("LIST"); u32(moviSize); cc("movi")
    var f = 0
    while (f < frames) {
      cc("00db"); u32(frameBytes)
      val r = ((colorSeed + 11L * f) % 256).toInt
      val g = ((7L * colorSeed + 17L * f) % 256).toInt
      val b = ((13L * colorSeed + 23L * f) % 256).toInt
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { bb.write(b); bb.write(g); bb.write(r); x += 1 }
        var p = width * 3
        while (p < stride) { bb.write(0); p += 1 }
        y += 1
      }
      f += 1
    }
    bb.toByteArray
  }

  /** Synthetic REAL-video corpus with decodable frame CONTENT: one
    * uncompressed-DIB AVI per document, dimensions/frame count/colors
    * derived from doc_id with closed-form decoded pixel statistics.
    */
  def attachSyntheticDibVideos(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val bytes = encodeAviDib((id % 16 + 4).toInt, (id % 12 + 3).toInt,
          (id % 5 + 1).toInt, id)
        MediaRow(id, bytes, "video", bytes.length)
      }
    }.toDF()
  }

  final case class VideoFrame(doc_id: Long, frame_idx: Int, width: Float,
                              height: Float, mean_r: Float, mean_g: Float,
                              mean_b: Float, mean_gray: Float,
                              n_pixels: Float)

  /** REAL video frame-CONTENT decode (pure JVM) for the two codecs a
    * JVM decodes without native libraries:
    *  - uncompressed BI_RGB DIB ('00db' raster frames, the layout
    *    `encodeAviDib` writes and real uncompressed AVIs use): decoded
    *    directly from the raster — bottom-up row order, BGR byte order,
    *    4-byte row stride. Statistics are row-order invariant, so
    *    top-down (negative biHeight) rasters decode identically.
    *  - MJPEG ('00dc' frames whose payload is a complete JPEG, the
    *    most common legacy-capture codec): each frame routes through
    *    the SAME ImageIO tier as still images ([[decodeImageFeatures]])
    *    — one decode path for both modalities.
    * Returns one 8-dim stats vector per decodable frame
    * `[width, height, mean_r, mean_g, mean_b, mean_gray, n_pixels,
    * codec]` (codec 0=DIB, 1=JPEG); None when the payload is not an
    * AVI or no frame decodes, so callers fall back to the stub tier —
    * after this tier that stub covers only codecs that genuinely need
    * native decoders (H.264 etc.).
    */
  def decodeVideoFrameFeatures(bytes: Array[Byte]): Option[Vector[Array[Float]]] = {
    try {
      if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
          fourcc(bytes, 8) != "AVI ") return None
      // pass 1: stream format (biWidth/biHeight/biBitCount/biCompression)
      // from LIST hdrl → LIST strl('vids') → strf
      var vw = 0; var vh = 0; var vbits = 0; var vcomp = -1L
      var pos = 12
      while (pos + 8 <= bytes.length) {
        val id = fourcc(bytes, pos)
        val size = u32le(bytes, pos + 4)
        if (size < 0 || pos + 8 + size > bytes.length) return None
        if (id == "LIST" && size >= 4 && fourcc(bytes, pos + 8) == "hdrl") {
          var inner = pos + 12
          val end = pos + 8 + size.toInt
          while (inner + 8 <= end) {
            val cid = fourcc(bytes, inner)
            val csize = u32le(bytes, inner + 4)
            if (csize < 0 || inner + 8 + csize > bytes.length) return None
            if (cid == "LIST" && csize >= 4 &&
                fourcc(bytes, inner + 8) == "strl") {
              var g = inner + 12
              val gend = inner + 8 + csize.toInt
              var isVids = false
              while (g + 8 <= gend) {
                val gid = fourcc(bytes, g)
                val gsize = u32le(bytes, g + 4)
                if (gsize < 0 || g + 8 + gsize > bytes.length) return None
                if (gid == "strh" && gsize >= 8)
                  isVids = fourcc(bytes, g + 8) == "vids"
                else if (gid == "strf" && gsize >= 40 && isVids) {
                  vw = u32le(bytes, g + 12).toInt // biWidth
                  vh = u32le(bytes, g + 16).toInt // biHeight (may be <0)
                  vbits = ((u32le(bytes, g + 20) >> 16) & 0xffff).toInt
                  vcomp = u32le(bytes, g + 24) // biCompression
                }
                g += 8 + gsize.toInt + (gsize.toInt & 1)
              }
            }
            inner += 8 + csize.toInt + (csize.toInt & 1)
          }
        }
        pos += 8 + size.toInt + (size.toInt & 1)
      }
      val habs = math.abs(vh)
      val stride = (vw * 3 + 3) & ~3
      val dibOk = vcomp == 0L && vbits == 24 && vw > 0 && habs > 0 &&
        vw.toLong * habs <= MaxDecodePixels
      // pass 2: decode each movi VIDEO frame through the matching tier
      aviVideoFrames(bytes).flatMap { frames =>
        val out = frames.flatMap { payload =>
          if (dibOk && payload.length >= stride.toLong * habs) {
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < habs) {
              val ro = y * stride
              var x = 0
              while (x < vw) {
                val o = ro + x * 3
                sb += payload(o) & 0xff; sg += payload(o + 1) & 0xff
                sr += payload(o + 2) & 0xff
                x += 1
              }
              y += 1
            }
            val n = vw.toLong * habs
            Some(Array(vw.toFloat, habs.toFloat,
              (sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat,
              (sb.toDouble / n).toFloat,
              ((sr + sg + sb).toDouble / (3.0 * n)).toFloat, n.toFloat, 0f))
          } else if (payload.length > 3 && (payload(0) & 0xff) == 0xff &&
                     (payload(1) & 0xff) == 0xd8) {
            decodeImageFeatures(payload).map(f =>
              Array(f(0), f(1), f(3), f(4), f(5), f(6), f(7), 1f))
          } else None
        }
        if (out.isEmpty) None else Some(out)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Partition-wise REAL frame-content decode: one row of pixel
    * statistics per decodable container frame (DIB and MJPEG tiers).
    * Same mapPartitions decoder-per-partition shape as the other
    * codecs; frames of payloads no JVM codec decodes yield no rows and
    * route to the stub tier at the call site.
    */
  /** Scene-cut detection over decoded frame statistics — the temporal
    * segmentation pass of a video curation pipeline (shot boundaries
    * for frame-sampling, dedup at the shot level, caption alignment):
    * a cut is a jump in consecutive frames' total intensity
    * |gray(f) − gray(f−1)| ≥ threshold, with gray = the exact
    * mean_r+mean_g+mean_b sum from [[decodeVideoFrames]] — pure
    * relational on top of the decode sweep: one window (lag) keyed by
    * video, ordered by frame index. At 100 TB the shuffle is keyed on
    * video id (frames of one video co-locate — bounded by the longest
    * video, the natural partition grain for every per-video op).
    */
  def sceneCuts(frames: DataFrame, threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    frames
      .withColumn("__gs", col("mean_r") + col("mean_g") + col("mean_b"))
      .withColumn("__prev", lag(col("__gs"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("doc_id"), col("frame_idx"),
        abs(col("__gs") - col("__prev")).as("delta"),
        (abs(col("__gs") - col("__prev")) >= threshold).as("is_cut"))
  }

  /** Cross-video near-duplicate frame detection over decoded frame
    * statistics — the candidate-generation pass of a video dedup
    * pipeline (re-encoded uploads, shared intro/outro footage,
    * mirrored clips): each frame is keyed by its dimensions plus a
    * quantized mean-color cube cell (`bucket`-wide per channel — the
    * grid-LSH shape: near frames usually share a cell, the standard
    * boundary-miss trade), candidates meet in a bucket equi-join, and
    * survive only if their exact per-channel mean distance (L∞) is at
    * most `maxDist` — so every emitted pair is verified, never just
    * co-bucketed. Output: (doc_a, doc_b, n_frame_pairs, min_dist),
    * doc_a < doc_b, one row per video pair.
    *
    * Scale shape: one shuffle on the bucket key; bucket population is
    * bounded by how many frames can share a color cell at the given
    * grid, the same capping regime as LSH banding; the join output —
    * not the corpus — is the quadratic term, and it only grows with
    * genuine near-duplicates. The verification distance is exact
    * integer arithmetic on the decoded means (solid fixture frames
    * make them exact), so gate m14 replays the whole pipeline in SQL.
    */
  def videoFrameNearDupPairs(frames: DataFrame, bucket: Int = 64,
                             maxDist: Int = 48): DataFrame = {
    require(bucket >= 1, s"bucket must be >= 1, got $bucket")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    def side(tag: String): DataFrame =
      frames.select(col("doc_id").as(s"doc_$tag"),
        col("width"), col("height"),
        col("mean_r").cast("int").as(s"r_$tag"),
        col("mean_g").cast("int").as(s"g_$tag"),
        col("mean_b").cast("int").as(s"b_$tag"))
        .withColumn("qr", floor(col(s"r_$tag") / bucket))
        .withColumn("qg", floor(col(s"g_$tag") / bucket))
        .withColumn("qb", floor(col(s"b_$tag") / bucket))
    side("a").join(side("b"),
        Seq("width", "height", "qr", "qg", "qb"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("dist", greatest(
        abs(col("r_a") - col("r_b")),
        abs(col("g_a") - col("g_b")),
        abs(col("b_a") - col("b_b"))))
      .filter(col("dist") <= maxDist)
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_frame_pairs"),
        min("dist").as("min_dist"))
  }

  def decodeVideoFrames(spark: SparkSession,
                        media: DataFrame): Dataset[VideoFrame] = {
    import spark.implicits._
    media.select("doc_id", "media", "media_type", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          decodeVideoFrameFeatures(r.media) match {
            case Some(frames) => frames.iterator.zipWithIndex.map {
              case (f, i) => VideoFrame(r.doc_id, i, f(0), f(1), f(2),
                f(3), f(4), f(5), f(6))
            }
            case None => Iterator.empty
          }
        }
      }
  }

  /** Frame sampling: cut the payload into `nFrames` equal byte slices
    * (stand-in for video frame extraction); returns one row per sampled
    * frame with its slice as a new binary column. Pure column algebra —
    * the slice offsets are computed in the plan, the explode is the only
    * row-expanding op.
    */
  def frameSample(media: DataFrame, nFrames: Int): DataFrame = {
    val frameLen = greatest((col("n_bytes") / nFrames).cast("int"), lit(1))
    media
      .withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame",
        substring(col("media"), (col("frame_idx") * frameLen + 1).cast("int"),
          frameLen))
      .filter(octet_length(col("frame")) > 0)
      .select("doc_id", "media_type", "frame_idx", "frame")
  }

  /** Partition-wise feature extraction (the mapInPandas analog):
    * iterate a whole partition through one decoder instance. Encoder-
    * typed Dataset in, typed Dataset out; Spark keeps the operation
    * pipelined with the scan (no shuffle).
    *
    * `image`-typed payloads go through the REAL ImageIO decoder
    * ([[decodeImageFeatures]]), `audio`-typed through the REAL WAV/PCM
    * decoder ([[decodeAudioFeatures]]), and `video`-typed through the
    * REAL AVI container-metadata walk ([[decodeVideoMetadata]]);
    * undecodable payloads fall back to the documented stub tier (for
    * video that also means frame-CONTENT features stay stubbed until a
    * codec is linked).
    *
    * `videoDecoder` is the EXTERNAL-CODEC PLUG POINT for natively-coded
    * video (H.264 etc. — formats the JVM cannot decode): a serializable
    * `bytes => Option[features]` consulted for `video` payloads AFTER
    * the built-in AVI walk declines and BEFORE the stub — so linking a
    * real codec (an ffmpeg JNI wrapper, say) changes ONE argument, not
    * the operator. It is deliberately a per-payload function: decoder
    * SESSION state (contexts, scratch buffers) belongs in the closure,
    * which mapPartitions instantiates once per partition — the same
    * discipline as the built-in tiers. None (default) = current
    * behavior, stub fallback.
    */
  /** REAL animated-GIF video codec — proof the [[extractFeatures]]
    * `videoDecoder` plug point composes with a non-stub codec, and a
    * working decoder for the one moving-picture format the JVM decodes
    * natively (ImageIO's GIF reader: LZW + palette, pure JVM, no new
    * deps). Emits the same 8-dim layout family as the AVI walk but
    * with CONTENT statistics the metadata walk cannot produce:
    * `[width, height, n_frames, usec_per_frame, mean_r, mean_g,
    * mean_b, mean_gray]` — per-channel means over EVERY pixel of EVERY
    * decoded frame. Frame delay comes from the first Graphic Control
    * Extension block (0x21 0xF9: centiseconds, little-endian). Returns
    * None for non-GIF payloads (signature check first — cost of a
    * decline is 6 bytes) and for any malformed payload (NonFatal +
    * the [[readImageGuarded]] dimension bound per frame via the
    * shared reader guard discipline), so the stub tier stays the
    * fallback. A `val`, not a `def`: the closure ships once per task
    * like any codebook reference.
    */
  val gifVideoDecoder: Array[Byte] => Option[Array[Float]] = { bytes =>
    try {
      if (bytes.length < 13 ||
          !(bytes.startsWith("GIF87a".getBytes) ||
            bytes.startsWith("GIF89a".getBytes))) None
      else {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              val w = reader.getWidth(0); val h = reader.getHeight(0)
              if (n <= 0 || w <= 0 || h <= 0 ||
                  w.toLong * h * n > MaxDecodePixels) None
              else {
                // optimized GIFs encode later frames as PARTIAL deltas
                // (smaller than frame 0) or occasionally larger than
                // the first frame, so both the divisor and the row
                // buffer must follow each frame's ACTUAL dimensions:
                // `np` accumulates the real summed pixel count, and
                // the row buffer is sized per frame (a frame wider
                // than frame 0 would otherwise overflow it). The
                // w·h·n check above only bounds FRAME-0-sized frames;
                // a crafted payload with a tiny first frame and huge
                // later ones would blow past it, so the RUNNING total
                // re-checks against the cap per frame — from header
                // dims (getWidth/getHeight(f) read the image
                // descriptor only), BEFORE the LZW decode spends the
                // memory/CPU the cap exists to bound
                var sr = 0L; var sg = 0L; var sb = 0L; var np = 0L
                var overCap = false
                var f = 0
                while (!overCap && f < n) {
                  val fw = reader.getWidth(f)
                  val fh = reader.getHeight(f)
                  if (fw <= 0 || fh <= 0 ||
                      np + fw.toLong * fh > MaxDecodePixels) overCap = true
                  else {
                    // decoded dims, not header dims, drive the walk:
                    // the cap check above is the bound, the decode is
                    // the truth (they agree for every well-formed GIF)
                    val img = reader.read(f)
                    val iw = img.getWidth
                    val row = new Array[Int](iw)
                    var y = 0
                    while (y < img.getHeight) {
                      img.getRGB(0, y, iw, 1, row, 0, iw)
                      var x = 0
                      while (x < iw) {
                        val rgb = row(x)
                        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
                        sb += rgb & 0xff
                        x += 1
                      }
                      y += 1
                    }
                    np += iw.toLong * img.getHeight
                  }
                  f += 1
                }
                // first Graphic Control Extension via a REAL block walk
                // (a raw byte scan would false-match 0x21 0xF9 0x04 runs
                // inside the global color table or LZW data, and could
                // not distinguish a genuine delay-0 GCE from "keep
                // looking"): skip the logical screen descriptor + global
                // color table, then iterate blocks until the first GCE,
                // image, or trailer
                var usec = 0L
                val packed = bytes(10) & 0xff
                var i = 13 + (if ((packed & 0x80) != 0)
                  3 * (1 << ((packed & 7) + 1)) else 0)
                var done = false
                while (!done && i < bytes.length) {
                  (bytes(i) & 0xff) match {
                    case 0x21 if i + 1 < bytes.length =>
                      val label = bytes(i + 1) & 0xff
                      if (label == 0xf9 && i + 6 < bytes.length) {
                        usec = ((bytes(i + 4) & 0xffL) |
                          (bytes(i + 5) & 0xffL) << 8) * 10000L
                        done = true
                      } else {
                        // skip extension sub-blocks
                        var j = i + 2
                        while (j < bytes.length && (bytes(j) & 0xff) != 0) {
                          j += 1 + (bytes(j) & 0xff)
                        }
                        i = j + 1
                      }
                    case 0x2c | 0x3b => done = true // image data / trailer
                    case _ => done = true // malformed: keep delay 0
                  }
                }
                if (overCap || np == 0L) None
                else Some(Array(w.toFloat, h.toFloat, n.toFloat,
                  usec.toFloat,
                  (sr.toDouble / np).toFloat, (sg.toDouble / np).toFloat,
                  (sb.toDouble / np).toFloat,
                  ((sr + sg + sb).toDouble / (3.0 * np)).toFloat))
              }
            } finally reader.dispose()
          }
        } finally iis.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode an animated GIF (one solid-color frame per entry of
    * `colors`, shared delay) — the fixture generator for the GIF codec
    * spec: every decoded statistic is a closed-form function of the
    * arguments. Pure ImageIO write-sequence, no new deps.
    */
  def encodeAnimatedGif(width: Int, height: Int, colors: Seq[Int],
                        delayCs: Int): Array[Byte] = {
    require(width > 0 && height > 0 && colors.nonEmpty && delayCs >= 0,
      s"bad gif fixture params ${width}x$height n=${colors.length}")
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { c =>
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, width, height)
        g.dispose()
        val meta = writer.getDefaultImageMetadata(
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img),
          writer.getDefaultWriteParam)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val gce = new javax.imageio.metadata
          .IIOMetadataNode("GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", delayCs.toString)
        gce.setAttribute("transparentColorIndex", "0")
        root.appendChild(gce)
        meta.setFromTree(fmt, root)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  def extractFeatures(spark: SparkSession, media: DataFrame,
                      videoDecoder: Option[Array[Byte] => Option[Array[Float]]] =
                        None): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media", "media_type", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        // one decoder "session" per partition (real codecs are stateful)
        rows.map { r =>
          val feats = r.media_type match {
            case "image" =>
              decodeImageFeatures(r.media).getOrElse(stubDecode(r.media))
            case "audio" =>
              decodeAudioFeatures(r.media).getOrElse(stubDecode(r.media))
            case "video" =>
              decodeVideoMetadata(r.media)
                .orElse(videoDecoder.flatMap(d => d(r.media)))
                .getOrElse(stubDecode(r.media))
            case _ => stubDecode(r.media)
          }
          MediaFeatures(r.doc_id, r.media_type,
            n_frames = math.max(1, r.n_bytes / 64), features = feats)
        }
      }
  }
}
