package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDecontaminateSpec extends SparkSpec {
  import StreamingDedup.Doc

  private val base = "the quick brown fox jumps over the lazy dog near the " +
    "wide river bank while the tall grey heron watches every small silver " +
    "fish swim slowly past the old wooden bridge under the warm sun today"

  test("exactStream drops normalization-equal benchmark matches inside the streaming plan") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val eval = Seq(100L -> base).toDF("doc_id", "text")
    val input = MemoryStream[Doc]
    val cleaned = StreamingDecontaminate.exactStream(
      input.toDF(), "text", eval, "text")
    val q = cleaned.writeStream.format("memory").queryName("exact_decon_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Doc(1L, ts("2020-01-01 00:00:00"), base.toUpperCase), // normalization-equal leak
      Doc(2L, ts("2020-01-01 00:00:01"), "clean doc one"))
    q.processAllAvailable()
    input.addData(
      Doc(3L, ts("2020-01-02 00:00:00"), "  " + base + "  "), // cross-batch leak
      Doc(4L, ts("2020-01-02 00:00:01"), "clean doc two"))
    q.processAllAvailable()
    q.stop()

    spark.table("exact_decon_out").select("doc_id").as[Long]
      .collect().sorted.toSeq shouldBe Seq(2L, 4L)
  }

  test("fuzzy foreachBatch accumulation equals the batch pass over the union") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val eval = Seq(100L -> base).toDF("doc_id", "text")
    val input = MemoryStream[Doc]
    val sink = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        sink.synchronized {
          sink ++= StreamingDecontaminate
            .fuzzyBatch(batch, "text", "doc_id", eval)
            .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
            .collect()
        }
        ()
      }
      .outputMode(OutputMode.Append()).start()

    val b1 = Seq(
      Doc(1L, ts("2020-01-01 00:00:00"), base), // exact leak
      Doc(2L, ts("2020-01-01 00:00:01"), "unrelated text about query engines"))
    val b2 = Seq(
      Doc(3L, ts("2020-01-02 00:00:00"), base.replace("today", "tonight")), // near-dup leak
      Doc(4L, ts("2020-01-02 00:00:01"), "another clean training document"))
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    // streaming accumulation == the batch pass over the full corpus
    val batchKept = graft.ops.Curation.fuzzyDecontaminate(
        (b1 ++ b2).toDF(), eval, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    sink.toSet shouldBe batchKept
    sink.toSet shouldBe Set(2L, 4L)
  }
}
