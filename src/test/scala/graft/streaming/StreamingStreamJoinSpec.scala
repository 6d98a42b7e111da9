package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingStreamJoinSpec extends SparkSpec {

  case class Click(user_id: Long, click_id: Long, cts: Timestamp)
  case class Purchase(user_id: Long, purchase_id: Long, pts: Timestamp)

  test("stream-stream join matches within the interval, across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamingStreamJoin.joinWithinInterval(
      clicks.toDF(), purchases.toDF(), "user_id", "cts", "pts",
      lookback = "0 seconds", lookahead = "30 minutes", horizon = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()

    // batch 1: clicks arrive first
    clicks.addData(
      Click(1L, 100L, ts("2020-01-01 10:00:00")),
      Click(2L, 200L, ts("2020-01-01 10:05:00")))
    q.processAllAvailable()
    // batch 2: purchases arrive later — u1 within 30m, u2 beyond it
    purchases.addData(
      Purchase(1L, 900L, ts("2020-01-01 10:20:00")),
      Purchase(2L, 901L, ts("2020-01-01 11:05:00")))
    q.processAllAvailable()
    // u1 purchase BEFORE the click must not match (lookback = 0)
    purchases.addData(Purchase(1L, 902L, ts("2020-01-01 09:50:00")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ss_join")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows shouldBe Set((100L, 900L))
  }
}
