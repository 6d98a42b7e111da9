package graft.streaming

import graft.SparkSpec
import graft.functions.FrequentItems.mgSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Trending items over a stream: the Misra–Gries aggregate is a
  * TypedImperativeAggregate, so it runs as a streaming complete-mode
  * aggregation with bounded state (≤ 2·capacity entries per group) —
  * the online shape of the heavy-hitters tier. The MG guarantee must
  * hold over everything arrived so far, across batch boundaries.
  */
class StreamingTrendingSpec extends SparkSpec {

  case class Event(grp: String, item: String)

  test("streaming MG sketch keeps the heavy item across batches within the bound") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val out = input.toDF().groupBy("grp")
      .agg(mgSketch(col("item"), capacity = 8).as("sketch"))
    val q = out.writeStream.format("memory").queryName("trending_out")
      .outputMode(OutputMode.Complete()).start()

    // batch 1: 'hot' 30×, 20 distinct cold items 1× each
    input.addData(
      (Seq.fill(30)(Event("g", "hot")) ++
        (1 to 20).map(i => Event("g", s"cold$i"))): _*)
    q.processAllAvailable()
    // batch 2: more heat + more noise
    input.addData(
      (Seq.fill(25)(Event("g", "hot")) ++
        (21 to 40).map(i => Event("g", s"cold$i"))): _*)
    q.processAllAvailable()
    q.stop()

    val sketch = spark.table("trending_out")
      .selectExpr("explode(sketch) as e").select("e.item", "e.count")
      .as[(String, Long)].collect().toMap
    // N = 95, capacity 8 -> bound 10; true hot count 55
    sketch.keySet should contain("hot")
    sketch("hot") should be >= 45L
    sketch("hot") should be <= 55L
  }
}
