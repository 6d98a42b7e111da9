package graft.streaming

import graft.SparkSpec
import graft.ops.GraphAnn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Serving a STREAM of queries against a static graph index. The beam
  * search is a bounded driver-side loop of Spark jobs (hops), so the
  * streaming form is `foreachBatch` — the production pattern for any
  * serve path that is itself multi-job: each micro-batch of queries
  * runs the full batched beam search against the frozen index and
  * appends its answers. Must equal the batch answers exactly.
  */
class StreamingGraphServeSpec extends SparkSpec {

  case class QueryVec(vec_id: Long, embedding: Array[Float])

  private val dim = 16
  private def vec(i: Int): Array[Float] =
    Array.tabulate(dim)(j => (math.sin(i * 31 + j * 7).abs +
      0.125 * (i % 5)).toFloat)

  test("streamed queries served via foreachBatch equal the batch answers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val corpus = (0 until 90).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val idx = GraphAnn.buildGraphIndex(corpus, nlist = 6, degree = 5,
      crossDegree = 2)

    val sink = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    val input = MemoryStream[QueryVec]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val answers = GraphAnn.queryGraphIndex(batch, idx, k = 3,
            beam = 3, hops = 2)
          .select("q_id", "n_id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        sink.synchronized { sink ++= answers }
        ()
      }
      .start()
    input.addData(QueryVec(0L, vec(0)), QueryVec(1L, vec(1)))
    q.processAllAvailable()
    input.addData(QueryVec(2L, vec(2)))
    q.processAllAvailable()
    q.stop()

    val batchAnswers = GraphAnn.queryGraphIndex(
        corpus.filter(col("vec_id") < 3), idx, k = 3, beam = 3, hops = 2)
      .select("q_id", "n_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    sink.toSet shouldBe batchAnswers
  }
}
