package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingCodeDedupSpec extends SparkSpec {

  case class CodeRow(doc_id: Long, ts: java.sql.Timestamp, code: Array[Long])

  test("exactCodeStream keeps first arrival per identical code within the horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[CodeRow]
    val out = StreamingCodeDedup.exactCodeStream(
      input.toDF(), "code", "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("code_dedup_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      CodeRow(1L, ts("2020-01-01 00:00:00"), Array(7L, 9L)),
      CodeRow(2L, ts("2020-01-01 00:00:01"), Array(7L, 9L)), // exact dup
      CodeRow(3L, ts("2020-01-01 00:00:02"), Array(8L, 9L)))
    q.processAllAvailable()
    input.addData( // cross-batch dup within the horizon
      CodeRow(4L, ts("2020-01-01 00:10:00"), Array(7L, 9L)),
      CodeRow(5L, ts("2020-01-01 00:10:01"), Array(1L, 2L)))
    q.processAllAvailable()
    q.stop()
    spark.table("code_dedup_out").select("doc_id").as[Long]
      .collect().sorted.toSeq shouldBe Seq(1L, 3L, 5L)
  }

  test("dedupBatch foreachBatch accumulation: corpus wins, in-batch min survives, state rolls forward") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // accumulated corpus holds code [0,0]; batch codes within hamming 3
    // of it (or of an earlier batch survivor) must drop
    var accumulated = Seq((100L, Array(0L, 0L))).toDF("doc_id", "code")
    val input = MemoryStream[CodeRow]
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val keep = StreamingCodeDedup.dedupBatch(
            batch.select("doc_id", "code"), accumulated, "doc_id", "code")
          .select("doc_id", "code")
        val rows = keep.collect()
        kept.synchronized { kept ++= rows.map(_.getLong(0)) }
        accumulated = accumulated.unionByName(keep)
        ()
      }.start()
    input.addData(
      CodeRow(1L, ts("2020-01-01 00:00:00"), Array(1L, 0L)),  // ~corpus: drop
      CodeRow(2L, ts("2020-01-01 00:00:01"), Array(0xF0F0L, 0xF0FL)), // novel: keep
      CodeRow(3L, ts("2020-01-01 00:00:02"), Array(0xF0F1L, 0xF0FL))) // ~2: drop (2 is smaller)
    q.processAllAvailable()
    input.addData( // near-dup of batch-1 SURVIVOR 2 — state rolled forward
      CodeRow(4L, ts("2020-01-02 00:00:00"), Array(0xF0F0L, 0xF0EL)),
      CodeRow(5L, ts("2020-01-02 00:00:01"), Array(0xAAAA5555L, 0x5555AAAAL)))
    q.processAllAvailable()
    q.stop()
    kept.sorted.toSeq shouldBe Seq(2L, 5L)
  }
}
