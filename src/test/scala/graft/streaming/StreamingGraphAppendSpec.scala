package graft.streaming

import graft.SparkSpec
import graft.ops.GraphAnn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Growing a graph index from a STREAM of vector batches: foreachBatch
  * folds each micro-batch through the exact append — because append is
  * provably rebuild-equivalent (n33), the index after any prefix of
  * the stream must equal a from-scratch build over everything seen.
  */
class StreamingGraphAppendSpec extends SparkSpec {

  case class Vec(vec_id: Long, embedding: Array[Float])

  private def vec(i: Int): Array[Float] =
    Array.tabulate(16)(j => (math.sin(i * 17 + j * 5).abs +
      0.25 * (i % 3)).toFloat)

  test("streamed appends converge to the from-scratch rebuild") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val base = (0 until 60).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    @volatile var idx = GraphAnn.buildGraphIndex(base, nlist = 4,
      degree = 4, crossDegree = 2)

    val input = MemoryStream[Vec]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) idx = GraphAnn.appendToGraphIndex(idx, batch)
        ()
      }
      .start()
    input.addData((60 until 75).map(i => Vec(i.toLong, vec(i))): _*)
    q.processAllAvailable()
    input.addData((75 until 90).map(i => Vec(i.toLong, vec(i))): _*)
    q.processAllAvailable()
    q.stop()

    val rebuilt = GraphAnn.buildGraphIndex(
      (0 until 90).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding"),
      nlist = 4, degree = 4, crossDegree = 2)
    def nbrs(i: GraphAnn.GraphIndex) = i.nodes
      .select("n_id", "neighbors").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    nbrs(idx) shouldBe nbrs(rebuilt)
  }
}
