package graft.streaming

import graft.SparkSpec
import graft.engine.Scd2
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingTemporalJoinSpec extends SparkSpec {

  case class Click(click_id: Long, user_id: Long, ts: Timestamp)

  test("streaming facts pick the version covering their timestamp") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // static SCD2 dim: user 1 has two versions split at 2020-06-01
    val dim = Scd2.scd2(
      Seq((1L, ts("2020-01-01 00:00:00"), "v1"),
          (1L, ts("2020-06-01 00:00:00"), "v2"),
          (2L, ts("2020-03-01 00:00:00"), "w1"))
        .toDF("user_id", "change_ts", "payload"),
      Seq("user_id"), "change_ts")
      .select(col("user_id").as("d_user_id"), col("payload"),
        col("effective_timestamp"), col("end_timestamp"))

    val input = MemoryStream[Click]
    val facts = input.toDF()
    val joined = StreamingTemporalJoin.temporalJoinStream(
      facts, dim, facts("user_id"), dim("d_user_id"), facts("ts"))
      .select("click_id", "payload")
    val q = joined.writeStream.format("memory").queryName("stj_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Click(10L, 1L, ts("2020-02-01 00:00:00")), // inside v1
      Click(11L, 1L, ts("2020-07-01 00:00:00")), // inside v2
      Click(12L, 2L, ts("2020-04-01 00:00:00")), // w1
      Click(13L, 2L, ts("2020-01-01 00:00:00"))) // before any version: dropped
    q.processAllAvailable()
    q.stop()

    val out = spark.table("stj_out").as[(Long, String)].collect().sortBy(_._1)
    out.toSeq shouldBe Seq((10L, "v1"), (11L, "v2"), (12L, "w1"))
  }

  test("rejects non-streaming fact and unsupported join types") {
    import spark.implicits._
    val staticDf = Seq((1L, 1L, ts("2020-01-01 00:00:00")))
      .toDF("click_id", "user_id", "ts")
    an[IllegalArgumentException] should be thrownBy {
      StreamingTemporalJoin.temporalJoinStream(staticDf, staticDf,
        staticDf("user_id"), staticDf("user_id"), staticDf("ts"))
    }
  }
}
