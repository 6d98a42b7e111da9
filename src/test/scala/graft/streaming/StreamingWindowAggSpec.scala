package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingWindowAggSpec extends SparkSpec {

  case class Ev(user_id: Long, ts: Timestamp, event_type: String)

  test("tumbling windows close on watermark, late events are dropped") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Ev]
    val agg = StreamingWindowAgg.tumblingCounts(
      input.toDF(), "ts", Seq("user_id"), "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("tumble_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Ev(1L, ts("2020-01-01 10:01:00"), "click"),
      Ev(1L, ts("2020-01-01 10:04:00"), "click"),
      Ev(2L, ts("2020-01-01 10:07:00"), "click"))
    q.processAllAvailable()
    // advance the watermark far past the 10:00-10:10 window...
    input.addData(Ev(9L, ts("2020-01-01 11:00:00"), "click"))
    q.processAllAvailable()
    // ...then send an event INTO the closed window: must be dropped
    input.addData(Ev(1L, ts("2020-01-01 10:05:00"), "late"))
    q.processAllAvailable()
    // flush: nothing further should alter the closed window
    input.addData(Ev(9L, ts("2020-01-01 12:00:00"), "click"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("tumble_out")
      .select("user_id", "window_start", "n").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    rows should contain((1L, ts("2020-01-01 10:00:00"), 2L))
    rows should contain((2L, ts("2020-01-01 10:00:00"), 1L))
    // the late event created no new emission for the closed window
    rows.count(_._2 == ts("2020-01-01 10:00:00")) shouldBe 2
  }

  test("sliding windows count each event in width/slide windows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Ev]
    val agg = StreamingWindowAgg.slidingCounts(
      input.toDF(), "ts", Seq.empty, "10 minutes", "5 minutes", "1 minute")
    val q = agg.writeStream.format("memory").queryName("slide_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(Ev(1L, ts("2020-01-01 10:03:00"), "click"))
    input.addData(Ev(9L, ts("2020-01-01 11:00:00"), "advance"))
    input.addData(Ev(9L, ts("2020-01-01 12:00:00"), "advance"))
    q.processAllAvailable()
    q.stop()

    val starts = spark.table("slide_out")
      .filter($"n" === 1).select("window_start").collect()
      .map(_.getTimestamp(0)).toSet
    // 10:03 falls in [09:55,10:05) and [10:00,10:10)
    starts should contain(ts("2020-01-01 09:55:00"))
    starts should contain(ts("2020-01-01 10:00:00"))
  }

  test("session windows merge within gap and split across it") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Ev]
    val agg = StreamingWindowAgg.sessionCounts(
      input.toDF(), "ts", Seq("user_id"), "5 minutes", "1 minute")
    val q = agg.writeStream.format("memory").queryName("session_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Ev(1L, ts("2020-01-01 10:00:00"), "a"),
      Ev(1L, ts("2020-01-01 10:03:00"), "b"),  // merges (3m < 5m gap)
      Ev(1L, ts("2020-01-01 10:20:00"), "c"))  // new session (17m gap)
    input.addData(Ev(9L, ts("2020-01-01 11:00:00"), "advance"))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("session_out").filter($"user_id" === 1)
      .select("window_start", "n").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    sessions shouldBe Set(
      (ts("2020-01-01 10:00:00"), 2L),
      (ts("2020-01-01 10:20:00"), 1L))
  }
}
