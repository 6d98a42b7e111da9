package graft.streaming

import graft.SparkSpec
import graft.ops.GraphAnn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Growing the LAYERED index from a STREAM of vector batches — the
  * StreamingGraphAppendSpec discipline at the HNSW tier: foreachBatch
  * folds each micro-batch through the exact append (levels are pure
  * id hash, so a vector's layer membership is the same no matter which
  * batch delivers it), and because append is rebuild-equivalent at
  * every layer (n41), the index after any prefix of the stream must
  * equal a from-scratch build over everything seen — per-layer
  * adjacency, levels, and all.
  */
class StreamingHnswAppendSpec extends SparkSpec {

  case class Vec(vec_id: Long, embedding: Array[Float])

  private def vec(i: Int): Array[Float] =
    Array.tabulate(16)(j => (math.sin(i * 17 + j * 5).abs +
      0.25 * (i % 3)).toFloat)

  test("streamed appends converge to the from-scratch layered rebuild") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val base = (0 until 60).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    @volatile var idx = GraphAnn.buildHnswIndex(base, nlist = 4,
      degree = 4, crossDegree = 2, levelFanout = 4, maxLevel = 2)

    val input = MemoryStream[Vec]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) idx = GraphAnn.appendToHnswIndex(idx, batch)
        ()
      }
      .start()
    input.addData((60 until 75).map(i => Vec(i.toLong, vec(i))): _*)
    q.processAllAvailable()
    input.addData((75 until 90).map(i => Vec(i.toLong, vec(i))): _*)
    q.processAllAvailable()
    q.stop()

    val rebuilt = GraphAnn.buildHnswIndex(
      (0 until 90).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding"),
      nlist = 4, degree = 4, crossDegree = 2, levelFanout = 4,
      maxLevel = 2)
    def adj(i: GraphAnn.HnswIndex) = i.adj
      .select("layer", "n_id", "neighbors").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    def levels(i: GraphAnn.HnswIndex) = i.nodes
      .select("n_id", "level").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    adj(idx) shouldBe adj(rebuilt)
    levels(idx) shouldBe levels(rebuilt)
  }
}
