package graft.streaming

import graft.SparkSpec
import graft.ops.{GraphAnn, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Nightly ingest against a SHARDED deployment: each micro-batch is
  * routed by the deployment's frozen cell→shard map and appended per
  * touched shard (`appendToGraphShards` / `appendToHnswShards` /
  * `appendToIvfPqShards` — all three tiers share the one
  * routing-append skeleton). Because routing is a frozen projection
  * and each per-shard append is rebuild-exact, the shards after any
  * prefix of the stream must equal fresh builds over the full
  * corpus's routed slices.
  */
class StreamingShardedAppendSpec extends SparkSpec {

  case class Vec(vec_id: Long, embedding: Array[Float])

  private def vec(i: Int): Array[Float] =
    Array.tabulate(16)(j => (math.sin(i * 17 + j * 5).abs +
      0.25 * (i % 3)).toFloat)

  test("routed streaming appends equal fresh builds over the routed slices, all tiers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val base = (0 until 60).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val all = (0 until 90).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val cells = Similarity.firstVectors(base, 8)
    val cellMap = Similarity.shardCellMap(base, cells, 2)
    def slice(c: org.apache.spark.sql.DataFrame, i: Int) =
      Similarity.routeByCellMap(c, cells, cellMap, 2)
        .filter(col("shard") === i).drop("shard")

    def buildG(c: org.apache.spark.sql.DataFrame) =
      GraphAnn.buildGraphIndex(c, nlist = 8, degree = 4,
        crossDegree = 2, centroids = Some(cells))
    def buildH(c: org.apache.spark.sql.DataFrame) =
      GraphAnn.buildHnswIndex(c, nlist = 8, degree = 4, crossDegree = 2,
        levelFanout = 4, maxLevel = 1, centroids = Some(cells))
    val fullPq = Similarity.buildIvfPqIndex(base, nlist = 8, m = 4,
      ks = 8)
    def buildPq(c: org.apache.spark.sql.DataFrame) =
      Similarity.buildIvfPqIndex(c, nlist = 8, m = 4, ks = 8,
        centroids = Some(fullPq.cells), codebook = Some(fullPq.codebook))

    @volatile var gShards = (0 until 2).map(i => buildG(slice(base, i)))
    @volatile var hShards = (0 until 2).map(i => buildH(slice(base, i)))
    @volatile var pShards = (0 until 2).map(i => buildPq(slice(base, i)))

    val input = MemoryStream[Vec]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val b = batch.localCheckpoint()
          gShards = GraphAnn.appendToGraphShards(gShards, b, cellMap)
            .toIndexedSeq
          hShards = GraphAnn.appendToHnswShards(hShards, b, cellMap)
            .toIndexedSeq
          pShards = Similarity.appendToIvfPqShards(pShards, b, cellMap)
            .toIndexedSeq
        }
        ()
      }
      .start()
    input.addData((60 until 75).map(i => Vec(i.toLong, vec(i))): _*)
    q.processAllAvailable()
    input.addData((75 until 90).map(i => Vec(i.toLong, vec(i))): _*)
    q.processAllAvailable()
    q.stop()

    def nbrs(i: GraphAnn.GraphIndex) = i.nodes
      .select("n_id", "neighbors").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def adjMap(i: GraphAnn.HnswIndex) = i.adj
      .select("layer", "n_id", "neighbors").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    def codesEqual(a: Similarity.IvfPqIndex, b: Similarity.IvfPqIndex) =
      a.codes.exceptAll(b.codes).count() == 0 &&
        b.codes.exceptAll(a.codes).count() == 0
    (0 until 2).foreach { i =>
      nbrs(gShards(i)) shouldBe nbrs(buildG(slice(all, i)))
      adjMap(hShards(i)) shouldBe adjMap(buildH(slice(all, i)))
      codesEqual(pShards(i), buildPq(slice(all, i))) shouldBe true
    }
  }
}
