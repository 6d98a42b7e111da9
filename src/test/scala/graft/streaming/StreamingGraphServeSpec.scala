package graft.streaming

import graft.SparkSpec
import graft.ops.{GraphAnn, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Serving a STREAM of queries against graph-tier indexes: the
  * expansion serves ([[GraphAnn.queryGraphIndexExpand]] and the
  * sharded [[GraphAnn.queryGraphIndexShardedAgg]] /
  * [[GraphAnn.queryHnswIndexShardedAgg]]) run as stream-static join
  * chains feeding ONE bounded-heap top-k — stream-legal where the
  * beam walk (an aggregation per hop) and the window-based gather
  * fold are not. The streamed answers must equal the same serve run
  * in batch, rank for rank.
  */
class StreamingGraphServeSpec extends SparkSpec {

  case class QueryVec(vec_id: Long, embedding: Array[Double])

  private val dim = 16
  private def vec(i: Int): Array[Double] =
    Array.tabulate(dim)(j => math.sin(i * 31 + j * 7).abs + 0.125 * (i % 5))

  test("streamed expansion serves equal their batch runs, single-index and sharded") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val corpus = (0 until 90).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val cells = Similarity.firstVectors(corpus, 6)
    val sharded = Similarity.shardByCells(corpus, cells, 3)
      .localCheckpoint()
    val gShards = (0 until 3).map(i => GraphAnn.buildGraphIndex(
      sharded.filter(col("shard") === i).drop("shard"), nlist = 6,
      degree = 4, crossDegree = 2, centroids = Some(cells)))
    val hShards = (0 until 3).map(i => GraphAnn.buildHnswIndex(
      sharded.filter(col("shard") === i).drop("shard"), nlist = 6,
      degree = 4, crossDegree = 2, levelFanout = 4, maxLevel = 1,
      centroids = Some(cells)))
    val batchQ = corpus.filter(col("vec_id") < 3)

    def runStream(name: String,
                  serve: org.apache.spark.sql.DataFrame =>
                    org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] = {
      val input = MemoryStream[QueryVec]
      val q = serve(input.toDF()).writeStream.format("memory")
        .queryName(name).outputMode(OutputMode.Complete()).start()
      input.addData(QueryVec(0L, vec(0)), QueryVec(1L, vec(1)))
      q.processAllAvailable()
      input.addData(QueryVec(2L, vec(2)))
      q.processAllAvailable()
      q.stop()
      spark.table(name).select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }

    def batchSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // sharded graph scatter: streamed ≡ batch, rank for rank
    runStream("graph_scatter_out",
      q => GraphAnn.queryGraphIndexShardedAgg(q, gShards, k = 4,
        hops = 2)) shouldBe batchSet(
      GraphAnn.queryGraphIndexShardedAgg(batchQ, gShards, k = 4,
        hops = 2))

    // single merged index, same contract
    val merged = GraphAnn.buildGraphIndex(corpus, nlist = 6, degree = 4,
      crossDegree = 2, centroids = Some(cells))
    runStream("graph_expand_out",
      q => GraphAnn.queryGraphIndexExpand(q, merged, k = 4,
        hops = 2)) shouldBe batchSet(
      GraphAnn.queryGraphIndexExpand(batchQ, merged, k = 4, hops = 2))

    // layered tier: the layer-0 expansion scatter
    runStream("hnsw_scatter_out",
      q => GraphAnn.queryHnswIndexShardedAgg(q, hShards, k = 4,
        hops = 2)) shouldBe batchSet(
      GraphAnn.queryHnswIndexShardedAgg(batchQ, hShards, k = 4,
        hops = 2))

    // PQ-compressed tier: ADC expansion scatter under shared frozen
    // artifacts — the production memory shape served from a stream
    val fullPq = GraphAnn.buildGraphPqIndex(corpus, nlist = 6,
      degree = 4, crossDegree = 2, m = 4, ks = 8, dim = dim,
      centroids = Some(cells))
    val pqShards = (0 until 3).map(i => GraphAnn.buildGraphPqIndex(
      sharded.filter(col("shard") === i).drop("shard"), nlist = 6,
      degree = 4, crossDegree = 2, m = 4, ks = 8, dim = dim,
      centroids = Some(cells), codebook = Some(fullPq.codebook)))
    runStream("graphpq_scatter_out",
      q => GraphAnn.queryGraphPqIndexShardedAgg(q, pqShards, k = 4,
        hops = 2)) shouldBe batchSet(
      GraphAnn.queryGraphPqIndexShardedAgg(batchQ, pqShards, k = 4,
        hops = 2))
  }
}
