package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The videoDecoder plug point with a REAL codec: animated GIF through
  * ImageIO — closed-form content statistics, hook precedence (AVI walk
  * first, codec second, stub last), and end-to-end composition through
  * extractFeatures.
  */
class GifCodecSpec extends SparkSpec {
  import spark.implicits._

  private val rgb = Seq(0xff0000, 0x00ff00, 0x0000ff)

  test("animated GIF decodes to exact closed-form statistics") {
    val gif = Multimodal.encodeAnimatedGif(6, 4, rgb, delayCs = 5)
    val f = Multimodal.gifVideoDecoder(gif).get
    // one pure-red, one pure-green, one pure-blue frame: each channel
    // averages 255/3 over the clip
    f shouldBe Array(6f, 4f, 3f, 50000f, 85f, 85f, 85f, 85f)
  }

  test("single-frame GIF and malformed payloads") {
    val one = Multimodal.encodeAnimatedGif(5, 5, Seq(0xffffff), delayCs = 0)
    val f = Multimodal.gifVideoDecoder(one).get
    f shouldBe Array(5f, 5f, 1f, 0f, 255f, 255f, 255f, 255f)
    Multimodal.gifVideoDecoder("GIF89a-not-really".getBytes) shouldBe None
    Multimodal.gifVideoDecoder(Array[Byte](1, 2, 3)) shouldBe None
  }

  test("extractFeatures routes video payloads: AVI walk, then the codec, then stub") {
    val gif = Multimodal.encodeAnimatedGif(6, 4, rgb, delayCs = 5)
    val avi = Multimodal.encodeAvi(320, 240, frames = 10,
      usecPerFrame = 40000, frameBytes = 16)
    val junk = Array.tabulate(64)(i => (i * 7).toByte)
    val media = Seq(
      (1L, gif, "video", gif.length),
      (2L, avi, "video", avi.length),
      (3L, junk, "video", junk.length))
      .toDF("doc_id", "media", "media_type", "n_bytes")
    val got = Multimodal.extractFeatures(spark, media,
        videoDecoder = Some(Multimodal.gifVideoDecoder))
      .collect().map(r => r.doc_id -> r.features).toMap
    got(1L) shouldBe Array(6f, 4f, 3f, 50000f, 85f, 85f, 85f, 85f)
    // the AVI container walk still wins for AVI payloads
    got(2L).take(4) shouldBe Array(320f, 240f, 10f, 40000f)
    // junk falls through codec to the stub tier
    got(3L) shouldBe Multimodal.stubDecode(junk)
    // without the codec hooked, the GIF payload would have stubbed
    val noHook = Multimodal.extractFeatures(spark, media)
      .collect().map(r => r.doc_id -> r.features).toMap
    noHook(1L) shouldBe Multimodal.stubDecode(gif)
  }
}
