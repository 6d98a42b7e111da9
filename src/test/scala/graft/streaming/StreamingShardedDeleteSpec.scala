package graft.streaming

import graft.SparkSpec
import graft.ops.{GraphAnn, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Nightly retention / right-to-erasure against a SHARDED deployment:
  * delete ids arrive on a stream and each micro-batch runs through the
  * routed fleet deletes (`deleteFromGraphShards` /
  * `deleteFromHnswShards` / `deleteFromIvfPqShards`). No routing map
  * is consulted — membership IS ownership (each id's owning shard
  * comes from shard state via one semi-join over the bounded delete
  * set), so the verbs are stream-composable as-is: foreachBatch feeds
  * them the micro-batch like any other bounded delete set. Because
  * each per-shard delete is rebuild-exact, the shards after any prefix
  * of the stream must equal fresh builds over the SURVIVING routed
  * slices. The stream-side mirror of [[StreamingShardedAppendSpec]];
  * together they pin the fleet's CRUD surface stream-legal end to end.
  */
class StreamingShardedDeleteSpec extends SparkSpec {

  case class Del(vec_id: Long)

  private def vec(i: Int): Array[Float] =
    Array.tabulate(16)(j => (math.sin(i * 17 + j * 5).abs +
      0.25 * (i % 3)).toFloat)

  test("routed streaming deletes equal fresh builds over the surviving slices, all tiers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val all = (0 until 90).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding").localCheckpoint()
    // two delete waves crossing BOTH shards, plus ids the index never
    // held (91..95 — must no-op, matching the batch verbs)
    val wave1 = (0 until 90 by 7).map(_.toLong) ++ Seq(91L, 93L)
    val wave2 = (3 until 90 by 11).map(_.toLong) ++ Seq(95L)
    val gone = (wave1 ++ wave2).toSet
    val surviving = all.filter(!col("vec_id").isin(gone.toSeq: _*))

    val cells = Similarity.firstVectors(all, 8)
    val cellMap = Similarity.shardCellMap(all, cells, 2)
    def slice(c: org.apache.spark.sql.DataFrame, i: Int) =
      Similarity.routeByCellMap(c, cells, cellMap, 2)
        .filter(col("shard") === i).drop("shard")

    def buildG(c: org.apache.spark.sql.DataFrame) =
      GraphAnn.buildGraphIndex(c, nlist = 8, degree = 4,
        crossDegree = 2, centroids = Some(cells))
    def buildH(c: org.apache.spark.sql.DataFrame) =
      GraphAnn.buildHnswIndex(c, nlist = 8, degree = 4, crossDegree = 2,
        levelFanout = 4, maxLevel = 1, centroids = Some(cells))
    val fullPq = Similarity.buildIvfPqIndex(all, nlist = 8, m = 4,
      ks = 8)
    def buildPq(c: org.apache.spark.sql.DataFrame) =
      Similarity.buildIvfPqIndex(c, nlist = 8, m = 4, ks = 8,
        centroids = Some(fullPq.cells), codebook = Some(fullPq.codebook))

    @volatile var gShards = (0 until 2).map(i => buildG(slice(all, i)))
    @volatile var hShards = (0 until 2).map(i => buildH(slice(all, i)))
    @volatile var pShards = (0 until 2).map(i => buildPq(slice(all, i)))

    val input = MemoryStream[Del]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val b = batch.localCheckpoint()
          gShards = GraphAnn.deleteFromGraphShards(gShards, b)
            .toIndexedSeq
          hShards = GraphAnn.deleteFromHnswShards(hShards, b)
            .toIndexedSeq
          pShards = Similarity.deleteFromIvfPqShards(pShards, b)
            .toIndexedSeq
        }
        ()
      }
      .start()
    input.addData(wave1.map(Del(_)): _*)
    q.processAllAvailable()
    input.addData(wave2.map(Del(_)): _*)
    q.processAllAvailable()
    q.stop()

    def nbrs(i: GraphAnn.GraphIndex) = i.nodes
      .select("n_id", "neighbors").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def entrySet(i: GraphAnn.GraphIndex) = i.entries
      .collect().map(_.toSeq).toSet
    def adjMap(i: GraphAnn.HnswIndex) = i.adj
      .select("layer", "n_id", "neighbors").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    def codesEqual(a: Similarity.IvfPqIndex, b: Similarity.IvfPqIndex) =
      a.codes.exceptAll(b.codes).count() == 0 &&
        b.codes.exceptAll(a.codes).count() == 0
    (0 until 2).foreach { i =>
      val freshG = buildG(slice(surviving, i))
      nbrs(gShards(i)) shouldBe nbrs(freshG)
      entrySet(gShards(i)) shouldBe entrySet(freshG)
      adjMap(hShards(i)) shouldBe adjMap(buildH(slice(surviving, i)))
      codesEqual(pShards(i), buildPq(slice(surviving, i))) shouldBe true
    }
  }
}
