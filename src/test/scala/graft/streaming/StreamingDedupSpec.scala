package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDedupSpec extends SparkSpec {
  import StreamingDedup._

  test("first-wins dedup across micro-batches; normalization-equal texts collapse") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Doc]
    val q = dedupStream(input.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()

    // batch 1: two distinct docs + an intra-batch duplicate (later ts loses)
    input.addData(
      Doc(1L, ts("2020-01-01 00:00:00"), "Hello  World"),
      Doc(2L, ts("2020-01-01 00:00:05"), "hello world"), // same normalized
      Doc(3L, ts("2020-01-01 00:00:01"), "something else"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate + one genuinely new doc
    input.addData(
      Doc(4L, ts("2020-01-02 00:00:00"), " HELLO   world "),
      Doc(5L, ts("2020-01-02 00:00:01"), "brand new"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out").as[Doc].collect().sortBy(_.doc_id)
    out.map(_.doc_id).toSeq shouldBe Seq(1L, 3L, 5L)
  }

  test("watermarked dedup drops in-horizon duplicates") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Doc]
    val deduped = dedupWithinWatermark(
      input.toDF(), eventTimeCol = "ts", textCol = "text", horizon = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("wm_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Doc(1L, ts("2020-01-01 10:00:00"), "alpha beta"),
      Doc(2L, ts("2020-01-01 10:10:00"), "Alpha  Beta"), // dup within horizon
      Doc(3L, ts("2020-01-01 10:20:00"), "gamma"))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("wm_out").select("doc_id").as[Long].collect().sorted
    ids.toSeq shouldBe Seq(1L, 3L)
  }
}
