package graft.streaming

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Serving a STREAM of queries against a static built index: the
  * aggregate-form serving path (probes explode → stream-static join on
  * the code table → TopK heap aggregate) must produce exactly the batch
  * answers for the same queries. Windows can't do this over a stream;
  * the bounded-heap aggregate can — which is the whole point of
  * [[Similarity.queryIvfPqIndexAgg]].
  */
class StreamingAnnServeSpec extends SparkSpec {

  case class QueryVec(vec_id: Long, embedding: Array[Double])

  private val dim = 16
  private def vec(i: Int): Array[Double] =
    Array.tabulate(dim)(j => math.sin(i * 31 + j * 7).abs + 0.125 * (i % 5))

  test("streamed queries against a static index equal the batch answers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val corpus = (0 until 80).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val idx = Similarity.buildIvfPqIndex(corpus, nlist = 8, m = 4, ks = 8,
      dim = dim)

    val input = MemoryStream[QueryVec]
    val served = Similarity.queryIvfPqIndexAgg(input.toDF(), idx, k = 3,
      nprobe = 8)
    val q = served.writeStream.format("memory").queryName("ann_serve_out")
      .outputMode(OutputMode.Complete()).start()
    input.addData(QueryVec(0L, vec(0)), QueryVec(1L, vec(1)))
    q.processAllAvailable()
    input.addData(QueryVec(2L, vec(2)))
    q.processAllAvailable()
    q.stop()

    val batch = Similarity.queryIvfPqIndexAgg(
        corpus.filter(col("vec_id") < 3), idx, k = 3, nprobe = 8)
      .select("q_id", "n_id", "rank").collect().toSet
    spark.table("ann_serve_out").select("q_id", "n_id", "rank")
      .collect().toSet shouldBe batch
  }
}
