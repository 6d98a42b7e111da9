package graft.streaming

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Serving a STREAM of queries against UNMERGED shard indexes: the
  * aggregate-form scatter ([[Similarity.queryIvfPqIndexScatterAgg]])
  * runs as |shards| stream-static joins feeding one bounded-heap
  * top-k — the per-shard partial heaps ARE the scatter-gather bound,
  * so the plan is stream-legal where the window-form scatter is not.
  * The streamed answers must equal the batch merged-index serve.
  */
class StreamingScatterServeSpec extends SparkSpec {

  case class QueryVec(vec_id: Long, embedding: Array[Double])

  private val dim = 16
  private def vec(i: Int): Array[Double] =
    Array.tabulate(dim)(j => math.sin(i * 31 + j * 7).abs + 0.125 * (i % 5))

  test("streamed scatter serve over shards equals the batch merged-index serve") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val corpus = (0 until 80).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val full = Similarity.buildIvfPqIndex(corpus, nlist = 8, m = 4,
      ks = 8, dim = dim)
    val sharded = Similarity.shardByCells(corpus, full.cells, 3)
      .localCheckpoint()
    val shards = (0 until 3).map(i => Similarity.buildIvfPqIndex(
      sharded.filter(col("shard") === i).drop("shard"), nlist = 8,
      m = 4, ks = 8, dim = dim, centroids = Some(full.cells),
      codebook = Some(full.codebook)))

    val input = MemoryStream[QueryVec]
    val served = Similarity.queryIvfPqIndexScatterAgg(input.toDF(),
      shards, k = 3, nprobe = 8)
    val q = served.writeStream.format("memory")
      .queryName("scatter_serve_out")
      .outputMode(OutputMode.Complete()).start()
    input.addData(QueryVec(0L, vec(0)), QueryVec(1L, vec(1)))
    q.processAllAvailable()
    input.addData(QueryVec(2L, vec(2)))
    q.processAllAvailable()
    q.stop()

    val batch = Similarity.queryIvfPqIndex(
        corpus.filter(col("vec_id") < 3), full, k = 3, nprobe = 8)
      .select("q_id", "n_id", "rank").collect().toSet
    spark.table("scatter_serve_out").select("q_id", "n_id", "rank")
      .collect().toSet shouldBe batch
  }
}
