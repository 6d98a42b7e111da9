package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus partition-wise decode /
  * feature-extract / frame-sample operators.
  *
  * The Spark side — schema, partitioning, batch iteration — is real and
  * tested. The decode step itself is a clearly-marked deterministic
  * STUB: the real codecs (libjpeg/ffmpeg) are not in this container, so
  * `stubDecode` stands in with a fixed bytes->features function. At
  * production scale the stub body is the only thing that changes; the
  * mapPartitions shape (decoder state reused across a partition's rows,
  * no per-row init) is the pattern the real codecs need.
  */
object Multimodal {

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
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media", "media_type", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        // one decoder "session" per partition (real codecs are stateful)
        rows.map { r =>
          val feats = stubDecode(r.media)
          MediaFeatures(r.doc_id, r.media_type,
            n_frames = math.max(1, r.n_bytes / 64), features = feats)
        }
      }
  }
}
